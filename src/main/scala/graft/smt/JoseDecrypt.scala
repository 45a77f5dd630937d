package graft.smt

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.BinaryType
import com.fasterxml.jackson.databind.ObjectMapper
import java.nio.charset.StandardCharsets
import java.util.Base64
import javax.crypto.Cipher
import javax.crypto.spec.{GCMParameterSpec, SecretKeySpec}

/**
 * JWE payload decryption — semantic port of the reference's JOSE SMT
 * (`smt/Jose.java:83-159`). The algorithm space is pinned tiny by the
 * reference (alg = "dir", enc = "A256GCM", `Jose.java:116-119`), so this is
 * a from-scratch direct-mode AES-256-GCM JWE decoder on `javax.crypto`
 * (no jose4j offline) following the public JWE spec (RFC 7516):
 *
 *  - input: flattened-JWE JSON `{"protected","iv","ciphertext","tag"}`
 *    compacted to `protected..iv.ciphertext.tag` (`Jose.java:122-129`);
 *  - AAD = ASCII bytes of the protected header's base64url text;
 *  - keys: comma-separated base64(JWK oct) configs tried in order
 *    (`Jose.java:60-80,111-150`); first success wins;
 *  - skip-on-error keeps the original payload (`Jose.java:131-137,152-158`),
 *    otherwise errors throw.
 */
final case class JoseConfig(keys: Seq[String], skipOnError: Boolean = false) {
  require(keys.nonEmpty, "No encryption keys have been configured.")
}

final case class JoseDecrypt(cfg: JoseConfig, column: String = "value") extends SmtStage {
  val name = "jose-decrypt"

  def apply(df: DataFrame): DataFrame = {
    require(df.schema(column).dataType == BinaryType,
      s"The JOSE SMT only supports bytes schemas, got ${df.schema(column).dataType.catalogString}.")
    // Key material resolves once on the driver and ships in the UDF closure
    // (the broadcast of a few dozen bytes).
    val keyBytes: Seq[Array[Byte]] = cfg.keys.map(Jwe.keyFromBase64Jwk)
    val skip = cfg.skipOnError
    val decrypt = udf { (v: Array[Byte]) =>
      if (v == null) null else Jwe.decryptFlattened(v, keyBytes, skip)
    }
    df.withColumn(column, decrypt(col(column)))
  }
}

object Jwe {
  private val mapper = new ObjectMapper()

  /** Parse a base64-encoded JWK (oct) config entry to raw key bytes
    * (`Jose.java:64-75`). */
  def keyFromBase64Jwk(base64Jwk: String): Array[Byte] = {
    val jwkJson = new String(Base64.getDecoder.decode(base64Jwk), StandardCharsets.UTF_8)
    val jwk = mapper.readTree(jwkJson)
    require(jwk.path("kty").asText() == "oct", "Only oct (symmetric) JWKs are supported.")
    b64url(jwk.path("k").asText())
  }

  private def b64url(s: String): Array[Byte] = Base64.getUrlDecoder.decode(s)

  /** Decrypt flattened-JWE bytes; on failure returns the original payload
    * (skipOnError) or throws, matching `Jose.java:111-158`. */
  def decryptFlattened(payload: Array[Byte], keys: Seq[Array[Byte]], skipOnError: Boolean): Array[Byte] = {
    val serialized = new String(payload, StandardCharsets.UTF_8)

    // Parse the flattened JWE JSON (parse failure: skip keeps payload,
    // strict throws — `Jose.java:130-137`).
    val (protectedB64, ivB64, ctB64, tagB64) =
      try {
        val n = mapper.readTree(serialized)
        require(n.hasNonNull("protected") && n.hasNonNull("iv") && n.hasNonNull("ciphertext") && n.hasNonNull("tag"),
          "Not a flattened JWE")
        (n.path("protected").asText(), n.path("iv").asText(), n.path("ciphertext").asText(), n.path("tag").asText())
      } catch {
        case e: Exception =>
          if (skipOnError) return payload
          throw new IllegalArgumentException(s"Flattened JWE could not be decoded.", e)
      }

    // Pinned algorithm constraints (`Jose.java:116-119`).
    val header = mapper.readTree(new String(b64url(protectedB64), StandardCharsets.UTF_8))
    if (header.path("alg").asText() != "dir" || header.path("enc").asText() != "A256GCM") {
      if (skipOnError) return payload
      throw new IllegalArgumentException(
        s"Unsupported JWE algorithms: alg=${header.path("alg").asText()} enc=${header.path("enc").asText()}")
    }

    val iv = b64url(ivB64)
    val ct = b64url(ctB64)
    val tag = b64url(tagB64)
    val aad = protectedB64.getBytes(StandardCharsets.US_ASCII)

    keys.foreach { key =>
      try {
        val cipher = Cipher.getInstance("AES/GCM/NoPadding")
        cipher.init(Cipher.DECRYPT_MODE, new SecretKeySpec(key, "AES"), new GCMParameterSpec(tag.length * 8, iv))
        cipher.updateAAD(aad)
        val full = new Array[Byte](ct.length + tag.length)
        System.arraycopy(ct, 0, full, 0, ct.length)
        System.arraycopy(tag, 0, full, ct.length, tag.length)
        return cipher.doFinal(full)
      } catch {
        case _: Exception => () // wrong key: try the next one (`Jose.java:147-149`)
      }
    }

    if (skipOnError) payload
    else throw new IllegalArgumentException("Message could not be decrypted with any encryption key")
  }
}
