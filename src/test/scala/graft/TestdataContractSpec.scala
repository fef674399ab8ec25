package graft

import org.apache.spark.sql.types._

import graft.sources.Tables

/** Schema CONTRACT over the driver-generated testdata (TESTDATA.md).
  *
  * The driver has regenerated the parquet between rounds with changed
  * physical types (`events.ts`: nanos-long in r6 → `timestamp[us]` in
  * r7), silently breaking four green queries mid-round. This spec makes
  * any such drift fail at ONE labelled assertion instead of four
  * downstream analysis errors: it loads every table at every generated
  * SF and checks the exact Spark-visible column types each registered
  * query assumes.
  *
  * `events.ts` (and the other time columns) get an explicit ADAPTIVE
  * contract: any type [[graft.queries.ParityQueries]]'s tsMicros helper
  * can normalize (timestamp, timestamp_ntz, or a raw nanos long). A new
  * physical type outside that set is exactly the drift that must fail
  * loudly here first.
  */
class TestdataContractSpec extends SparkSpec {

  private val sfDirs = Seq("sf0.001", "sf0.01", "sf0.1")
    .map(sf => s"/root/testdata/$sf")
    .filter(d => new java.io.File(d).isDirectory)

  /** Types the event-time normalizer (ParityQueries.tsMicros) accepts. */
  private val timeLike: Set[DataType] =
    Set(TimestampType, TimestampNTZType, LongType)

  private val exact: Map[String, Map[String, DataType]] = Map(
    "region" -> Map("r_regionkey" -> IntegerType, "r_name" -> StringType),
    "nation" -> Map("n_nationkey" -> IntegerType, "n_name" -> StringType,
      "n_regionkey" -> IntegerType),
    "customer" -> Map("c_custkey" -> LongType, "c_name" -> StringType,
      "c_nationkey" -> IntegerType, "c_acctbal" -> DoubleType,
      "c_mktsegment" -> StringType),
    "supplier" -> Map("s_suppkey" -> LongType, "s_name" -> StringType,
      "s_nationkey" -> IntegerType, "s_acctbal" -> DoubleType),
    "part" -> Map("p_partkey" -> LongType, "p_name" -> StringType,
      "p_brand" -> StringType, "p_type" -> StringType,
      "p_size" -> IntegerType, "p_retailprice" -> DoubleType),
    "orders" -> Map("o_orderkey" -> LongType, "o_custkey" -> LongType,
      "o_orderstatus" -> StringType, "o_totalprice" -> DoubleType,
      "o_orderpriority" -> StringType),
    "lineitem" -> Map("l_orderkey" -> LongType, "l_partkey" -> LongType,
      "l_suppkey" -> LongType, "l_linenumber" -> IntegerType,
      "l_quantity" -> DoubleType, "l_extendedprice" -> DoubleType,
      "l_discount" -> DoubleType, "l_tax" -> DoubleType,
      "l_returnflag" -> StringType, "l_linestatus" -> StringType),
    "events" -> Map("event_id" -> LongType, "user_id" -> LongType,
      "event_type" -> StringType, "value" -> DoubleType,
      "props" -> StringType),
    "documents" -> Map("doc_id" -> LongType, "text" -> StringType,
      "lang" -> StringType, "source" -> StringType,
      "n_chars" -> LongType),
    "embeddings" -> Map("vec_id" -> LongType,
      "embedding" -> ArrayType(FloatType), "label" -> IntegerType)
  )

  /** (table, column) pairs carrying event/business time: the type may
    * legitimately vary across driver rounds but must stay tsMicros- or
    * timestamp-comparison-compatible. */
  private val timeColumns = Seq(
    "events" -> "ts", "lineitem" -> "l_shipdate", "orders" -> "o_orderdate")

  test("every generated SF exposes the column types the registered " +
    "queries assume (events.ts drift fails HERE, not in four plans)") {
    assert(sfDirs.nonEmpty, "no generated testdata found under /root/testdata")
    for (dir <- sfDirs; tbl <- Tables.names) {
      val schema = Tables(spark, dir, tbl).schema
      val byName = schema.fields.map(f => f.name -> f.dataType).toMap
      for ((c, want) <- exact(tbl)) {
        val got = byName.get(c)
        assert(got.contains(want),
          s"$dir/$tbl.$c: expected $want, got ${got.orNull} — testdata " +
            "schema drifted; re-check every query reading this column")
      }
    }
    for (dir <- sfDirs; (tbl, c) <- timeColumns) {
      val got = Tables(spark, dir, tbl).schema
        .fields.find(_.name == c).map(_.dataType)
      assert(got.exists(g => timeLike.contains(g)),
        s"$dir/$tbl.$c: time column is ${got.orNull}, outside the " +
          s"adaptive set $timeLike — extend ParityQueries.tsMicros (and " +
          "the oracle SQL) before trusting any event-time query")
    }
  }

  test("contract names the current events.ts physical type explicitly") {
    // Pin what the data IS today (timestamp[us] → TIMESTAMP_NTZ under
    // Spark's parquet reader) so the next regeneration shows up as a
    // reviewed diff of this line, not a surprise.
    for (dir <- sfDirs) {
      val got = Tables(spark, dir, "events").schema
        .fields.find(_.name == "ts").map(_.dataType)
      assert(got.contains(TimestampNTZType),
        s"$dir/events.ts is ${got.orNull} (was TIMESTAMP_NTZ when this " +
          "contract was written) — tsMicros adapts, but re-verify the " +
          "event-time oracle twins before shipping")
    }
  }
}
