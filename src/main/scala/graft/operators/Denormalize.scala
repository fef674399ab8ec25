package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** The flagship denormalization pipeline — the Spark-native re-expression of
  * the reference's `sync_denormalized_tickets` (reference:
  * src/ticket_sync.py:21-217 and the SQL it pushes to Postgres at
  * src/db_connector.py:225-386), mapped onto the testdata star schema:
  *
  *   orders    ≈ Ticket              (fact being denormalized)
  *   lineitem  ≈ TicketStatus        (per-ticket history rows)
  *   part      ≈ Label               (dimension grouped to a nested array)
  *   customer  ≈ User, nation ≈ Module, region ≈ DataSource (lookup dims)
  *
  * Scale notes (the 100 TB plan):
  *  - the only fact-side shuffles are hash partitionings on the fact key
  *    (`l_orderkey`): one for the latest-status aggregation, one for the
  *    labels aggregation — both combiner-friendly (partial aggregation
  *    runs map-side), and the joined output stays partitioned on the same
  *    key so the two left joins need no further fact shuffle.
  *  - All lookup dims are broadcast (they are bounded: customers/nations/
  *    regions are ~1e5 rows even at 100 TB of facts), so no fact-side
  *    shuffle for J3-J5.
  *  - No global sort: the reference's ORDER BY number
  *    (src/db_connector.py:300) existed only to make pandas batching stable;
  *    a lake sink has no use for a total order, so we drop it by default and
  *    expose it as the separate O1 operator.
  */
object Denormalize {

  /** Fixed run timestamp for deterministic lineage in tests/oracles. A real
    * run passes `current_timestamp()` semantics via [[withLineage]]'s param
    * (reference stamps utcnow() once per run — src/ticket_sync.py:89). */
  val RunTs = "2026-01-01T00:00:00Z"

  /** W1: latest row per key — the reference's Postgres
    * `SELECT DISTINCT ON (ts."ticketId") ... ORDER BY ts."ticketId",
    * ts."createdAt" DESC` idiom (reference: src/db_connector.py:262-269).
    * `tiebreak` gives the total order Postgres lacks (SURVEY §7.4) so
    * results are deterministic under the DuckDB oracle.
    */
  def latestPerKey(df: DataFrame, key: String, orderBy: Seq[Column]): DataFrame =
    df.withColumn("rn", row_number().over(
        Window.partitionBy(col(key)).orderBy(orderBy: _*)))
      .filter(col("rn") === 1)
      .drop("rn")

  /** Latest lineitem ("status") per order, newest shipdate first,
    * computed as a single `max_by(struct …)` hash aggregation rather than
    * a ranking window: one combiner-friendly (partial-agg) shuffle, no
    * per-partition sort — the cheaper plan at any scale when only the
    * top-1 row is needed. The lexicographic max over (shipdate,
    * linenumber, returnflag, linestatus) is total over every *projected*
    * column — the synthetic data contains rows duplicated even in
    * (orderkey, shipdate, linenumber), so any shorter chain leaves the
    * winner engine-dependent (SURVEY §7.4 DISTINCT ON determinism risk,
    * observed for real at sf0.01). */
  def latestStatus(lineitem: DataFrame): DataFrame =
    lineitem
      .groupBy(col("l_orderkey"))
      .agg(max_by(
        struct(col("l_returnflag").as("status_flag"),
          col("l_linestatus").as("status_name"),
          col("l_shipdate").as("status_at")),
        struct(col("l_shipdate"), col("l_linenumber"),
          col("l_returnflag"), col("l_linestatus"))).as("v"))
      .select(col("l_orderkey"), col("v.status_flag"),
        col("v.status_name"), col("v.status_at"))

  /** A2/J9: group-to-array of labels per ticket (reference:
    * src/document_utils.py:78-99 builds `{ticketId: [label dicts]}` in a
    * Python dict; here one `collect_set` hash aggregation). Sorted and
    * distinct so the output is deterministic. */
  def labelsPerOrder(lineitem: DataFrame, part: DataFrame): DataFrame =
    lineitem
      .join(part, lineitem("l_partkey") === part("p_partkey"))
      .groupBy(col("l_orderkey"))
      .agg(array_sort(collect_set(col("p_name"))).as("label_names"))

  /** Nested-struct variant of the label grouping — the shape the reference
    * actually indexes (`labels: [{id,name,color}]`,
    * src/ticket_sync.py:44-49). Kept separate because arrays of structs are
    * not hash-comparable through the SQL oracle. */
  def labelStructsPerOrder(lineitem: DataFrame, part: DataFrame): DataFrame =
    lineitem
      .join(part, lineitem("l_partkey") === part("p_partkey"))
      .groupBy(col("l_orderkey"))
      // sort_array, not array_sort: same total order over non-null
      // structs (field-by-field natural ordering; the set has no null
      // elements), but SortArray sorts with an interpreted ordering
      // while array_sort evaluates its comparator LAMBDA expression
      // twice per comparison (r19)
      .agg(sort_array(collect_set(
        struct(col("p_partkey").as("id"), col("p_name").as("name"),
               col("p_brand").as("color")))).as("labels"))

  /** F2/F5/F6: lineage columns — `document_id = {id}_{run_ts}` and
    * `indexed_at` (reference: src/ticket_sync.py:133-139). Historized,
    * append-only semantics: a new run timestamp yields disjoint ids. */
  def withLineage(df: DataFrame, idCol: String, runTs: String): DataFrame =
    df.withColumn("document_id", concat_ws("_", col(idCol), lit(runTs)))
      .withColumn("indexed_at", lit(runTs).cast("timestamp"))

  /** The full flagship pipeline (reference lifecycle §3.2):
    * soft-filtered fact ⟕ latest-status ⟕ labels-array ⟕ broadcast dims,
    * 17-ish aliased projection, lineage stamping. */
  def apply(
      orders: DataFrame, lineitem: DataFrame, part: DataFrame,
      customer: DataFrame, nation: DataFrame, region: DataFrame,
      runTs: String = RunTs): DataFrame = {
    val labels = labelsPerOrder(lineitem, part)
      .withColumn("labels", array_join(col("label_names"), "|"))
      .drop("label_names")
    assemble(orders, lineitem, labels, customer, nation, region, runTs)
  }

  /** Flagship variant that ships the label dimension in the shape the
    * reference actually indexes — `labels: [{id,name,color}]` nested
    * structs (src/ticket_sync.py:44-49) — instead of the pipe-joined
    * string [[apply]] uses for hash-comparability. Same plan skeleton:
    * the labels aggregation is still one combiner-friendly hash shuffle
    * on the fact key; only the aggregated value type changes, so the
    * 100 TB story is identical. */
  def nested(
      orders: DataFrame, lineitem: DataFrame, part: DataFrame,
      customer: DataFrame, nation: DataFrame, region: DataFrame,
      runTs: String = RunTs): DataFrame =
    assemble(orders, lineitem, labelStructsPerOrder(lineitem, part),
      customer, nation, region, runTs)

  /** Shared join/projection skeleton: `labels` must expose the fact key
    * `l_orderkey` plus a single `labels` column of whatever shape. */
  private def assemble(
      orders: DataFrame, lineitem: DataFrame, labels: DataFrame,
      customer: DataFrame, nation: DataFrame, region: DataFrame,
      runTs: String): DataFrame = {
    val latest = latestStatus(lineitem)
    val denorm = orders
      .join(latest, orders("o_orderkey") === latest("l_orderkey"), "left")
      .drop(latest("l_orderkey"))
      .join(labels, orders("o_orderkey") === labels("l_orderkey"), "left")
      .drop(labels("l_orderkey"))
      .join(broadcast(customer),
        orders("o_custkey") === customer("c_custkey"), "left")
      .join(broadcast(nation),
        customer("c_nationkey") === nation("n_nationkey"), "left")
      .join(broadcast(region),
        nation("n_regionkey") === region("r_regionkey"), "left")
      .select(
        col("o_orderkey").cast("string").as("ticket_id"),
        col("o_orderkey").as("ticket_number"),
        col("o_orderdate").as("ticket_created"),
        col("o_orderstatus").as("ticket_status"),
        col("status_flag"),
        col("status_name"),
        col("status_at"),
        col("c_name").as("user_name"),
        col("n_name").as("module_name"),
        col("r_name").as("datasource_name"),
        col("labels"),
        round(col("o_totalprice"), 2).as("total_price"))
    withLineage(denorm, "ticket_id", runTs)
  }
}
