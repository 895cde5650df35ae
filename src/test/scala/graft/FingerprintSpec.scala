package graft

import org.apache.spark.sql.functions._
import graft.functions.GraftFunctions

/** Winnowing rolling-hash fingerprints (Schleimer et al., SIGMOD'03). */
class FingerprintSpec extends SparkTestBase {
  import spark.implicits._

  private def fps(texts: String*): Seq[Set[Long]] =
    texts.toDF("t")
      .select(GraftFunctions.winnow($"t", 8, 4).as("f"))
      .collect().map(_.getSeq[Long](0).toSet).toSeq

  test("identical documents fingerprint identically; short docs give []") {
    val Seq(a, b) = fps("the quick brown fox jumps over the lazy dog",
      "the quick brown fox jumps over the lazy dog")
    assert(a == b && a.nonEmpty)
    assert(fps("short").head.isEmpty, "below k-gram length -> no fingerprints")
  }

  test("winnowing guarantee: shared substring of length >= w+k-1 shares a fingerprint") {
    // k=8, w=4: any common substring of length >= 11 guarantees overlap.
    val shared = "zzzzzzzzzzzzzzzzzzzzzzzz" // 24 chars, shared verbatim
    val Seq(a, b) = fps(s"left padding $shared", s"$shared other tail entirely")
    assert((a intersect b).nonEmpty, s"guarantee violated: $a vs $b")
  }

  test("near-duplicates share most fingerprints; unrelated docs share none") {
    val doc = "the standard winnowing construction selects the minimum hash of each window of consecutive k gram hashes"
    val nearDup = doc.replace("standard", "typical")
    val other = "completely different content with no overlapping character runs at all here"
    val Seq(a, b, c) = fps(doc, nearDup, other)
    val overlap = (a intersect b).size.toDouble / math.max(a.size, 1)
    assert(overlap > 0.5, s"near-dup overlap too low: $overlap")
    assert((a intersect c).isEmpty, "unrelated docs should not collide")
  }

  test("winnowCandidates surfaces the same dup pairs minhash finds on testdata") {
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    val viaWinnow = graft.similarity.NearDup
      .winnowCandidates(docs, "doc_id", "text", minShared = 4)
      .select("doc_id_a", "doc_id_b").as[(Long, Long)].collect().toSet
    val viaMinhash = graft.similarity.NearDup
      .minhashCandidates(docs, "doc_id", "text")
      .as[(Long, Long)].collect().toSet
    // Different mechanisms, same duplicates: demand substantial agreement.
    assert(viaWinnow.nonEmpty)
    val overlap = (viaWinnow intersect viaMinhash).size.toDouble / viaMinhash.size
    assert(overlap >= 0.8, s"winnow $viaWinnow vs minhash $viaMinhash ($overlap)")
  }

  test("SQL surface: graft_winnow resolves through the extension") {
    val n = spark.sql(
      "SELECT size(graft_winnow('the quick brown fox jumps over it', 8, 4)) AS n")
      .head().getInt(0)
    assert(n > 0)
  }
}
