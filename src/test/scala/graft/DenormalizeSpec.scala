package graft

import org.apache.spark.sql.functions._

import graft.operators.Denormalize

/** Unit spec for the flagship denormalization operators, on tiny
  * in-memory frames mirroring the reference's conftest fixtures
  * (reference: tests/conftest.py:14-61 — 2-3 row frames). */
class DenormalizeSpec extends SparkSpec {
  import spark.implicits._

  private def lineitems = Seq(
    // orderkey, partkey, linenumber, shipdate, returnflag, linestatus
    (1L, 10L, 1, "2024-01-01", "N", "O"),
    (1L, 11L, 2, "2024-03-01", "R", "F"), // latest for order 1
    (2L, 10L, 1, "2024-02-01", "A", "F")  // only row for order 2
  ).toDF("l_orderkey", "l_partkey", "l_linenumber", "l_shipdate",
    "l_returnflag", "l_linestatus")
    .withColumn("l_shipdate", col("l_shipdate").cast("timestamp"))

  test("latestPerKey keeps exactly the newest row per key") {
    val latest = Denormalize.latestStatus(lineitems)
    val rows = latest.orderBy("l_orderkey").collect()
    assert(rows.length == 2)
    assert(rows(0).getAs[String]("status_flag") == "R") // order 1 → Mar 1
    assert(rows(1).getAs[String]("status_flag") == "A")
  }

  test("latestPerKey tiebreak is deterministic (same ts → higher lineno)") {
    val tied = Seq(
      (1L, 10L, 1, "2024-01-01", "X", "O"),
      (1L, 11L, 2, "2024-01-01", "Y", "O")
    ).toDF("l_orderkey", "l_partkey", "l_linenumber", "l_shipdate",
      "l_returnflag", "l_linestatus")
      .withColumn("l_shipdate", col("l_shipdate").cast("timestamp"))
    val rows = Denormalize.latestStatus(tied).collect()
    assert(rows.length == 1 && rows(0).getAs[String]("status_flag") == "Y")
  }

  test("labelsPerOrder groups distinct sorted labels per order") {
    val part = Seq((10L, "blue", "B1"), (11L, "red", "B2"))
      .toDF("p_partkey", "p_name", "p_brand")
    val labels = Denormalize.labelsPerOrder(lineitems, part)
      .orderBy("l_orderkey").collect()
    assert(labels.length == 2)
    assert(labels(0).getAs[scala.collection.Seq[String]]("label_names").toSeq == Seq("blue", "red"))
    assert(labels(1).getAs[scala.collection.Seq[String]]("label_names").toSeq == Seq("blue"))
  }

  test("withLineage stamps historized document ids (disjoint across runs)") {
    val df = Seq(("42")).toDF("id")
    val r1 = Denormalize.withLineage(df, "id", "2026-01-01T00:00:00Z")
    val r2 = Denormalize.withLineage(df, "id", "2026-01-02T00:00:00Z")
    val id1 = r1.collect()(0).getAs[String]("document_id")
    val id2 = r2.collect()(0).getAs[String]("document_id")
    assert(id1 == "42_2026-01-01T00:00:00Z")
    assert(id1 != id2) // append-only historization, not upsert
  }

  test("denormalization keeps facts with no status/labels (left joins)") {
    val orders = Seq(
      (1L, 100L, "2024-01-01", "O", "P1", 10.0),
      (3L, 999L, "2024-01-03", "F", "P3", 30.0) // no lineitems, no customer
    ).toDF("o_orderkey", "o_custkey", "o_orderdate", "o_orderstatus",
      "o_orderpriority", "o_totalprice")
      .withColumn("o_orderdate", col("o_orderdate").cast("timestamp"))
    val part = Seq((10L, "blue", "B1"), (11L, "red", "B2"))
      .toDF("p_partkey", "p_name", "p_brand")
    val customer = Seq((100L, "alice", 5L))
      .toDF("c_custkey", "c_name", "c_nationkey")
    val nation = Seq((5L, "FR", 1L))
      .toDF("n_nationkey", "n_name", "n_regionkey")
    val region = Seq((1L, "EUROPE")).toDF("r_regionkey", "r_name")
    val out = Denormalize(orders, lineitems, part, customer, nation, region)
    val rows = out.orderBy("ticket_number").collect()
    assert(rows.length == 2)
    assert(rows(0).getAs[String]("user_name") == "alice")
    assert(rows(0).getAs[String]("labels") == "blue|red")
    // orphan fact survives with nulls — reference left-join semantics
    assert(rows(1).getAs[String]("user_name") == null)
    assert(rows(1).getAs[String]("labels") == null)
  }
}
