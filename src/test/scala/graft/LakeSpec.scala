package graft

import org.apache.spark.sql.functions._

import graft.sinks.Lake

/** Bucketed tables must co-join and pre-aggregate without a shuffle —
  * the storage-level scale property (one clustered write, no fact
  * shuffle on any later read). */
class LakeSpec extends SparkSpec {
  import spark.implicits._

  private def withNoBroadcast[A](f: => A): A = {
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try f finally
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }

  // written per-test (idempotent) so each test stands alone
  private def writeFixtures(): Unit = {
    val facts = (1L to 100L).map(i => (i % 10, i, s"f$i"))
      .toDF("k", "id", "payload")
    val hist = (1L to 50L).map(i => (i % 10, s"h$i")).toDF("k", "h")
    Lake.writeBucketed(facts, "lake_facts", "k", 4)
    Lake.writeBucketed(hist, "lake_hist", "k", 4)
  }

  test("bucketed ⋈ bucketed on the bucket key plans without a shuffle") {
    writeFixtures()
    withNoBroadcast {
      val joined = Lake.read(spark, "lake_facts")
        .join(Lake.read(spark, "lake_hist"), Seq("k"))
      assert(joined.count() === 500)
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange hashpartitioning"),
        s"bucketed join still shuffles:\n$plan")
    }
  }

  test("groupBy(bucketKey) over a bucketed table skips the shuffle") {
    writeFixtures()
    val agg = Lake.read(spark, "lake_facts").groupBy("k")
      .agg(count(lit(1)).as("n"))
    assert(agg.count() === 10)
    val plan = agg.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange hashpartitioning"),
      s"bucketed aggregation still shuffles:\n$plan")
  }
}
