package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/**
 * Text-analysis operators for large-scale training-data pipelines: token
 * counting, quality scoring, language ID (n-gram/stopword heuristic) and
 * document fingerprinting. All pure Catalyst expressions (no UDFs) — they
 * stay inside whole-stage codegen and scale linearly with no shuffle.
 */
object TextOps {

  /** Whitespace token count. regexp_extract_all('\S+') rather than split:
    * identical empty/leading/trailing semantics in any SQL engine (the
    * oracle reproduces it verbatim). */
  def wsTokenCount(text: Column): Column =
    size(regexp_extract_all(text, lit("\\S+"), lit(0)))

  /** Word tokens (non-whitespace runs), lowercased. */
  def words(text: Column): Column =
    regexp_extract_all(lower(text), lit("\\S+"), lit(0))

  /** BPE-ish subword pretokenizer count: letter runs, digit runs, single
    * punctuation — the usual GPT-2-style pretoken split approximation. */
  val bpePattern = "[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]"
  def bpeTokenCount(text: Column): Column =
    size(regexp_extract_all(text, lit(bpePattern), lit(0)))

  /** Character-class counts via strip-and-diff (codegen'd, single pass each). */
  def countMatching(text: Column, charClass: String): Column =
    length(text) - length(regexp_replace(text, charClass, ""))

  /** Quality features: length, punctuation/digit/upper ratios, mean word
    * length, stopword ratio; `quality` is a [0,1] composite. */
  def qualityFeatures(df: DataFrame, textCol: String = "text"): DataFrame = {
    val t = col(textCol)
    val n = length(t).cast(DoubleType)
    val ws = words(t)
    val sw = LangProfiles.stopwords("en") ++ LangProfiles.stopwords("fr") ++
      LangProfiles.stopwords("de") ++ LangProfiles.stopwords("es")
    df.withColumn("n_chars_m", length(t))
      .withColumn("n_words", wsTokenCount(t))
      .withColumn("punct_ratio", round(countMatching(t, "[.,!?;:]") / nullif(n, lit(0.0)), 4))
      .withColumn("digit_ratio", round(countMatching(t, "[0-9]") / nullif(n, lit(0.0)), 4))
      .withColumn("upper_ratio", round(countMatching(t, "[A-Z]") / nullif(n, lit(0.0)), 4))
      .withColumn("mean_word_len", round(n / nullif(col("n_words").cast(DoubleType), lit(0.0)), 4))
      .withColumn("stopword_ratio",
        round(size(filter(ws, w => w.isin(sw: _*))) / nullif(size(ws).cast(DoubleType), lit(0.0)), 4))
      .withColumn("quality", round(greatest(least(
        lit(0.7)
          - least(col("punct_ratio") * 2, lit(0.3))
          - least(col("digit_ratio") * 2, lit(0.3))
          + least(col("stopword_ratio"), lit(0.3))
          - when(col("n_words") < 5, 0.3).otherwise(0.0), lit(1.0)), lit(0.0)), 4))
  }

  /** Per-source corpus profile: doc counts, content-distinct counts, token
    * totals and exact quantiles — the summary a curation run reports per
    * shard/source. `approx = true` switches to the sketch aggregates
    * (approx_count_distinct / percentile_approx) for the 100 TB path where
    * exact DISTINCT and exact quantiles would hold per-group sorted state;
    * the oracle gate uses the exact mode (both engines define linear-
    * interpolated quantiles identically). */
  def corpusProfile(df: DataFrame, textCol: String = "text",
                    groupCol: String = "source", approx: Boolean = false): DataFrame = {
    val d = df.withColumn("__wc", wsTokenCount(col(textCol)))
    val distinctTexts =
      if (approx) approx_count_distinct(md5(col(textCol))).as("distinct_texts")
      else countDistinct(md5(col(textCol))).as("distinct_texts")
    def pct(p: Double) =
      if (approx) expr(s"percentile_approx(__wc, $p, 10000)").cast(DoubleType)
      else expr(s"percentile(__wc, $p)")
    d.groupBy(col(groupCol))
      .agg(
        count(lit(1)).as("n_docs"),
        distinctTexts,
        sum(col("__wc")).cast(LongType).as("total_tokens"),
        (floor(avg(col("__wc")) * lit(1e6) + lit(0.5)) / lit(1e6)).as("tok_mean"),
        pct(0.5).as("tok_p50"),
        pct(0.9).as("tok_p90"))
  }

  /** Top-N most frequent token n-grams over a token-array column — the
    * vocab / contamination diagnostic a curation run reports. One explode
    * feeding a partial-aggregating hash agg: the only full shuffle carries
    * (distinct gram, count) pairs, and topN is a TakeOrdered (bounded heap
    * per partition), not a global sort. Ties deterministic: count desc,
    * then gram lexicographic asc (both engines compare int lists
    * elementwise). */
  def topTokenNgrams(df: DataFrame, tokensCol: String, n: Int, topN: Int): DataFrame = {
    val t = col(tokensCol)
    val grams = when(size(t) >= n,
      transform(sequence(lit(0), size(t) - n), i => slice(t, i + lit(1), lit(n))))
      .otherwise(typedlit(Seq.empty[Seq[Int]]))
    df.select(explode(grams).as("gram"))
      .groupBy("gram").agg(count(lit(1)).as("cnt"))
      .orderBy(col("cnt").desc, col("gram").asc)
      .limit(topN)
  }

  /** Positional structural fingerprint: sum_i(i * len(word_i)) mod P —
    * order-sensitive (a shuffled document fingerprints differently), cheap,
    * and reproducible in plain SQL for the oracle. 1-based positions. */
  def fingerprint(text: Column): Column = {
    val weighted = transform(words(text), (w, i) => (i + 1).cast(LongType) * length(w).cast(LongType))
    pmod(aggregate(weighted, lit(0L), (acc, x) => acc + x), lit(1000000007L))
  }

  /** URLs — RE2-safe, shared verbatim with the SQL oracle. */
  val UrlPattern = "https?://\\S+"

  /** URL match count — link-density curation signal. */
  def urlCount(text: Column): Column =
    size(regexp_extract_all(text, lit(UrlPattern), lit(0))).cast(IntegerType)

  /** Fraction of characters inside URLs — boilerplate / link-farm signal. */
  def urlCharRatio(text: Column): Column = {
    val urlChars = aggregate(
      transform(regexp_extract_all(text, lit(UrlPattern), lit(0)), u => length(u)),
      lit(0), (s, x) => s + x)
    urlChars.cast(DoubleType) / nullif(length(text).cast(DoubleType), lit(0.0))
  }

  /** Email addresses — the RE2-compatible subset (no backrefs/lookaround),
    * so the same pattern string runs verbatim in any SQL engine's regex. */
  val EmailPattern = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"

  /** North-American-style phone shapes (555-123-4567, 555.123.4567 etc.). */
  val PhonePattern = "[0-9]{3}[-. ][0-9]{3}[-. ][0-9]{4}"

  /** PII scrub for training text: global regex redaction of emails and
    * phone-shaped numbers (pure expressions — linear scan, no shuffle; the
    * pattern set is deliberately RE2-safe and oracle-reproducible). Order
    * matters and is fixed: emails first, then phones. */
  def redactPii(text: Column): Column =
    regexp_replace(
      regexp_replace(text, EmailPattern, "<EMAIL>"),
      PhonePattern, "<PHONE>")

  /** Count of redactions [[redactPii]] would make (emails + phones) —
    * curation pipelines filter/score on PII density before scrubbing. */
  def piiCount(text: Column): Column =
    (size(regexp_extract_all(text, lit(EmailPattern), lit(0))) +
      size(regexp_extract_all(text, lit(PhonePattern), lit(0)))).cast(IntegerType)

  /** Intra-document repetition removal (Gopher-style): split on
    * `delimRegex`, keep the FIRST occurrence of each segment in order, join
    * back with `joiner`. Pure expressions — `array_distinct` preserves
    * first-occurrence order in Spark (pinned in OpsSpec). */
  def dedupSegments(text: Column, delimRegex: String, joiner: String): Column =
    array_join(array_distinct(split(text, delimRegex)), joiner)

  /** Fraction of segments that are repeats of an earlier one — the
    * repetition quality signal curation filters on. */
  def segmentDupRatio(text: Column, delimRegex: String): Column = {
    val segs = split(text, delimRegex)
    (size(segs) - size(array_distinct(segs))).cast(DoubleType) / size(segs)
  }

  /** Per-language stopword hit count (multiset: repeated stopwords count). */
  def stopwordHits(text: Column, lang: String): Column =
    size(filter(words(text), w => w.isin(LangProfiles.stopwords(lang): _*)))

  /** Scalar form of [[langId]] for the SQL surface: argmax of per-language
    * stopword hits via array_position (first match = earliest language on
    * ties — the same semantics as langId's strict-`>` fold; equivalence is
    * pinned in OpsSpec). */
  def langIdCol(t: Column): Column = {
    val scores = array(LangProfiles.langs.map(l => stopwordHits(t, l).cast(DoubleType)): _*)
    val mx = array_max(scores)
    when(mx <= 0, lit("und"))
      .otherwise(element_at(typedlit(LangProfiles.langs),
        array_position(scores, mx).cast(IntegerType)))
  }

  /** Heuristic language ID: argmax of per-language stopword hit counts;
    * ties keep the earlier language in [[LangProfiles.langs]] order (strict
    * `>` in the fold). Deterministic; no model files. */
  def langId(df: DataFrame, textCol: String = "text", out: String = "lang_pred"): DataFrame = {
    val t = col(textCol)
    val langs = LangProfiles.langs
    val scores = langs.map(l => stopwordHits(t, l).cast(DoubleType).as(s"__hits_$l"))
    val withScores = df.select(df.columns.map(col) ++ scores: _*)
    val best = langs.foldLeft((lit("und"), lit(-1.0))) { case ((bl, bs), l) =>
      val s = col(s"__hits_$l")
      (when(s > bs, lit(l)).otherwise(bl), when(s > bs, s).otherwise(bs))
    }
    withScores
      .withColumn(out, when(best._2 <= 0, lit("und")).otherwise(best._1))
      .drop(langs.map(l => s"__hits_$l"): _*)
  }
}

/** Tiny embedded language profiles (top stopwords). Public-knowledge word
  * lists; intentionally small — this is a heuristic language ID, not a model. */
object LangProfiles {
  val langs = Seq("en", "fr", "de", "es")
  private val sw: Map[String, Seq[String]] = Map(
    "en" -> Seq("the", "of", "and", "to", "in", "is", "that", "it", "was", "for", "on", "are", "with", "as", "his", "they", "at", "be", "this", "have"),
    "fr" -> Seq("le", "la", "les", "de", "des", "et", "un", "une", "du", "en", "est", "que", "qui", "dans", "pour", "pas", "sur", "avec", "au", "il"),
    "de" -> Seq("der", "die", "das", "und", "ist", "in", "den", "von", "zu", "mit", "sich", "des", "auf", "nicht", "es", "ein", "eine", "als", "auch", "an"),
    "es" -> Seq("el", "la", "los", "las", "de", "y", "en", "un", "una", "que", "es", "del", "se", "por", "con", "para", "su", "al", "lo", "como"))
  def stopwords(lang: String): Seq[String] = sw.getOrElse(lang, Nil)
}
