package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class SnapshotDiffSpec extends SparkSpec {

  import spark.implicits._

  test("diff classifies added/deleted/updated and ignores unchanged rows") {
    val prev = Seq((1L, "a", "s1"), (2L, "b", "s1"), (3L, "c", "s2"),
                   (5L, null.asInstanceOf[String], "s3"))
      .toDF("id", "text", "src")
    val cur = Seq((2L, "b", "s1"), (3L, "c CHANGED", "s2"), (4L, "d", "s2"),
                  (5L, null.asInstanceOf[String], "s3"))
      .toDF("id", "text", "src")
    val out = SnapshotDiff.diff(prev, cur, "id", Seq("text", "src"))
      .orderBy("id").collect()
    assert(out.map(r => (r.getLong(0), r.getString(1))).toSeq ==
      Seq((1L, "deleted"), (3L, "updated"), (4L, "added")))
    // row 5 (null content, present identically in both) must NOT appear
  }

  test("null content transitions count as updates") {
    val prev = Seq((1L, "x")).toDF("id", "text")
    val cur = Seq((1L, null.asInstanceOf[String])).toDF("id", "text")
    val out = SnapshotDiff.diff(prev, cur, "id", Seq("text")).collect()
    assert(out.length == 1 && out(0).getString(1) == "updated")
  }

  test("snapshot diff query covers all three change kinds deterministically") {
    val a = SnapshotDiff.snapshotDiffQuery(spark, sfDir).collect()
    val b = SnapshotDiff.snapshotDiffQuery(spark, sfDir).collect()
    assert(a.sameElements(b))
    val kinds = a.map(_.getString(1)).toSet
    assert(kinds == Set("added", "deleted", "updated"))
    // every added key is ≡0 mod 5, every deleted ≡0 mod 41
    assert(a.filter(_.getString(1) == "added").forall(_.getLong(0) % 5 == 0))
    assert(a.filter(_.getString(1) == "deleted").forall(_.getLong(0) % 41 == 0))
  }
}
