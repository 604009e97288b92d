package graft.tools

import graft.core.Tables
import graft.llm.Dedup

/** Dev A/B for the q_dedup_edit spellings on the REAL corpus (r15
  * verdict #2): cold + 2 warm samples each, interleaved so ambient
  * load hits both evenly. `ScaleProbe edit` carries the 1x/4x scaling
  * legs; this records the isolated sf0.1 number the judge tracks.
  * Usage: runMain graft.tools.EditAB [sfDir]
  */
object EditAB {
  def main(a: Array[String]): Unit = {
    val sfDir = a.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = graft.core.Graft.session("edit-ab", "local[32]")
    val d = Tables.load(spark, sfDir, "documents")
    def time(n: String)(f: => Long): Unit = {
      val t0 = System.nanoTime(); val r = f
      println(f"[edit-ab] $n%-16s ${(System.nanoTime() - t0) / 1e9}%7.2f s   rows=$r")
    }
    d.count() // absorb session startup
    for (round <- 1 to 3) {
      time(s"payload_$round")(Dedup.editVerifiedPairsPayload(d).count())
      time(s"refetch_$round")(Dedup.editVerifiedPairs(d).count())
    }
    spark.stop()
  }
}
