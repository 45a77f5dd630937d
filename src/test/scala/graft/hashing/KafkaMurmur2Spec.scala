package graft.hashing

import org.scalatest.funsuite.AnyFunSuite

class KafkaMurmur2Spec extends AnyFunSuite {
  // Partition placements pinned by the reference's OutboxTest.java:265-268
  // ("some-partition-key" -> 1, "another-partition-key" -> 2, of 3) and
  // :431,:529 ("1234-5678" -> 2 of 3).
  test("reproduces Kafka default-partitioner placements") {
    assert(KafkaMurmur2.partition("some-partition-key", 3) == 1)
    assert(KafkaMurmur2.partition("another-partition-key", 3) == 2)
    assert(KafkaMurmur2.partition("1234-5678", 3) == 2)
  }

  test("handles all tail lengths and empty input") {
    // exercise length % 4 == 0,1,2,3 paths
    Seq("", "a", "ab", "abc", "abcd", "abcde").foreach { s =>
      val h = KafkaMurmur2.hash(s.getBytes("UTF-8"))
      assert(KafkaMurmur2.toPositive(h) >= 0)
    }
  }

  test("stable across calls") {
    val b = "stability".getBytes("UTF-8")
    assert(KafkaMurmur2.hash(b) == KafkaMurmur2.hash(b.clone()))
  }
}
