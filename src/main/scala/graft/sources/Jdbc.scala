package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** JDBC extraction source — the production-side counterpart of [[Tables]]
  * (the reference extracts from PostgreSQL/MySQL via SQLAlchemy/pandas:
  * per-entity scans src/db_connector.py:135-223, LIMIT/OFFSET pagination
  * data_lake_sync.py:127-135, dialect-aware identifier quoting
  * src/db_connector.py:66-103).
  *
  * What replaces what:
  *  - S1 full scans → `spark.read.jdbc` with the soft-delete predicate in
  *    the DataFrame plan: Catalyst pushes `deletedAt IS NULL` (and any
  *    point lookup, P2) into the generated remote SQL — no hand-written
  *    WHERE strings, no SQL injection surface (the reference interpolates
  *    ids into SQL text, src/db_connector.py:296-298).
  *  - S2 LIMIT/OFFSET loop → a *partitioned* read: `numPartitions` tasks
  *    each fetch one `partitionColumn` range concurrently. OFFSET
  *    pagination re-scans the prefix per page (O(n²) server work);
  *    range-partitioned reads stream each row once and parallelize across
  *    executors — the only shape that survives a 100 TB extraction.
  *  - S5 identifier quoting/dialects → Spark's `JdbcDialects` registry
  *    (PostgresDialect/MySQLDialect quote per driver automatically);
  *    schema-qualification stays plain text in `table` (e.g.
  *    `copy."Ticket"`).
  *
  * Exercised offline against embedded Derby (`JdbcSpec`): scans,
  * partitioned parallel reads, remote-SQL pushdown of filters, and
  * catalog introspection all run against a real JDBC database; the
  * parquet [[Tables]] source feeds the oracle-checked queries.
  */
object Jdbc {

  /** Connection descriptor (reference: env-driven config,
    * src/config.py:8-23). Pass credentials via `properties`, never in the
    * URL. */
  final case class Conn(url: String, user: String, password: String,
                        driver: Option[String] = None)

  private def baseReader(spark: SparkSession, conn: Conn) = {
    val r = spark.read.format("jdbc")
      .option("url", conn.url)
      .option("user", conn.user)
      .option("password", conn.password)
      // rows streamed per round-trip; pandas' read_sql default buffers
      // everything — this is the knob that bounds executor memory
      .option("fetchsize", "10000")
    conn.driver.fold(r)(d => r.option("driver", d))
  }

  /** S1: full-table scan. Filters/projections applied on the returned
    * DataFrame are pushed down to the database by Catalyst. */
  def table(spark: SparkSession, conn: Conn, table: String): DataFrame =
    baseReader(spark, conn).option("dbtable", table).load()

  /** S2: partitioned parallel scan over a numeric/temporal key range —
    * the scale replacement for LIMIT/OFFSET pagination. Bounds are only
    * partition-split hints; rows outside them are still read (by the
    * first/last partition), so correctness never depends on them. */
  def partitionedTable(
      spark: SparkSession, conn: Conn, table: String,
      partitionColumn: String, lowerBound: Long, upperBound: Long,
      numPartitions: Int): DataFrame =
    baseReader(spark, conn)
      .option("dbtable", table)
      .option("partitionColumn", partitionColumn)
      .option("lowerBound", lowerBound)
      .option("upperBound", upperBound)
      .option("numPartitions", numPartitions)
      .load()

  /** Push an arbitrary query to the database (the reference's
    * denormalization CTE could run here instead of in Spark when the
    * source DB is cheap and the network is not). */
  def query(spark: SparkSession, conn: Conn, sql: String): DataFrame =
    baseReader(spark, conn).option("query", sql).load()

  /** S4: catalog introspection — table list per dialect (the reference
    * uses SQLAlchemy `inspect`, src/db_connector.py:41-64, which does the
    * same dialect dispatch internally; column metadata comes free as
    * `table(...).schema`). information_schema covers Postgres/MySQL/
    * SQL Server; Derby (the embedded engine the spec runs against)
    * exposes its catalog as SYS.* tables instead. Driver-side
    * `collect()` is bounded metadata — a table list, never data. */
  def tableNames(spark: SparkSession, conn: Conn,
                 schema: String = "public"): Seq[String] = {
    val esc = schema.replace("'", "''")
    val sql =
      if (conn.url.startsWith("jdbc:derby"))
        "SELECT t.tablename FROM sys.systables t " +
          "JOIN sys.sysschemas s ON t.schemaid = s.schemaid " +
          s"WHERE s.schemaname = '$esc' AND t.tabletype = 'T'"
      else
        "SELECT table_name FROM information_schema.tables " +
          s"WHERE table_schema = '$esc'"
    query(spark, conn, sql).collect().map(_.getString(0)).toSeq
  }
}
