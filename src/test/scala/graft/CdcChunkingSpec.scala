package graft

import org.apache.spark.sql.functions._

/** The property that justifies content-defined over fixed-size
  * chunking: a prefix insertion shifts every byte, but boundaries
  * realign at the first content-defined cut after the edit, so the
  * shifted copy shares almost all its chunks with the original.
  */
class CdcChunkingSpec extends SparkSpec {
  import spark.implicits._

  private def mkDocs(docs: Seq[(Long, String)]): String = {
    val dir = java.nio.file.Files.createTempDirectory("cdc-spec").toString
    docs.toDF("doc_id", "text")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    dir
  }

  private def stats(docs: Seq[(Long, String)]): (Long, Long, Double) = {
    val r = Queries.cdcChunks(spark, mkDocs(docs)).first()
    (r.getLong(0), r.getLong(1), r.getDouble(2))
  }

  // deterministic text with enough entropy to produce interior cuts
  private def synth(n: Int, seed: Int): String = {
    val rnd = new scala.util.Random(seed)
    (1 to n).map { _ =>
      if (rnd.nextInt(6) == 0) ' ' else ('a' + rnd.nextInt(26)).toChar
    }.mkString
  }

  test("a prefix insertion shares almost all chunks with the original") {
    val a = synth(2000, 11)
    val b = "XYZ" + a
    val (totA, distA, _) = stats(Seq(1L -> a))
    assert(distA == totA, "a single doc cannot have duplicate chunks here")
    assert(totA >= 5, s"text too uniform to cut: only $totA chunks")
    val (tot, dist, _) = stats(Seq(1L -> a, 2L -> b))
    // fixed-size chunking would give ~2·totA distinct chunks; CDC must
    // share everything after the first realigned boundary
    assert(tot >= 2 * totA, s"expected both docs' chunks, got $tot")
    assert(dist <= totA + 2,
      s"shifted copy failed to realign: $dist distinct vs $totA base")
  }

  test("identical documents dedup to one chunk set") {
    val a = synth(1500, 23)
    val (totA, distA, _) = stats(Seq(1L -> a))
    val (tot, dist, _) = stats(Seq(1L -> a, 2L -> a, 3L -> a))
    assert(tot == 3 * totA)
    assert(dist == distA, "identical docs must share every chunk")
  }

  test("chunks reassemble exactly to each document (no loss, no overlap)") {
    // boundary semantics: cuts partition the text; lengths sum to len
    val docs = Seq(1L -> synth(700, 5), 2L -> "short", 3L -> synth(90, 9))
    val (tot, _, avgLen) = stats(docs)
    val totalChars = docs.map(_._2.length).sum
    assert(math.abs(avgLen * tot - totalChars) < 1e-3 * totalChars,
      s"chunk lengths don't reassemble: $avgLen * $tot != $totalChars")
  }

  test("documents shorter than the window become one whole chunk") {
    val (tot, dist, avgLen) = stats(Seq(1L -> "tiny"))
    assert(tot == 1 && dist == 1 && math.abs(avgLen - 4.0) < 1e-12)
  }
}
