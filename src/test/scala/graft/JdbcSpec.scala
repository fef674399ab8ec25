package graft

import java.sql.DriverManager

import org.apache.spark.sql.functions._

import graft.sources.Jdbc

/** S2/S4/S5 exercised against a real JDBC database: embedded Derby
  * (ships in /opt/spark/jars, pure Java, in-memory). Covers the
  * reference's extraction layer behaviors (src/db_connector.py:135-223):
  * full scan, predicate pushdown into the remote SQL, partitioned
  * parallel read (the LIMIT/OFFSET replacement), arbitrary query
  * pushdown, and catalog introspection. */
class JdbcSpec extends SparkSpec {

  private val url = "jdbc:derby:memory:graftjdbc;create=true"
  private val conn = Jdbc.Conn(url, "app", "app")

  // one-time schema + rows via plain JDBC (the "database being synced")
  private lazy val setup: Unit = {
    System.setProperty("derby.stream.error.file", "/tmp/derby-test.log")
    val c = DriverManager.getConnection(url)
    try {
      val st = c.createStatement()
      st.executeUpdate(
        "CREATE TABLE tickets (id INT NOT NULL PRIMARY KEY, " +
          "title VARCHAR(64), deleted_at TIMESTAMP)")
      st.executeUpdate(
        "CREATE TABLE statuses (id INT NOT NULL PRIMARY KEY, " +
          "name VARCHAR(32))")
      (1 to 20).foreach { i =>
        val del =
          if (i % 5 == 0) "TIMESTAMP('2026-01-01 00:00:00')" else "NULL"
        st.executeUpdate(
          s"INSERT INTO tickets VALUES ($i, 'ticket $i', $del)")
      }
      st.executeUpdate("INSERT INTO statuses VALUES (1, 'open')")
      st.close()
    } finally c.close()
  }

  test("S1: full scan + soft-delete filter pushed into the remote SQL") {
    setup
    val df = Jdbc.table(spark, conn, "tickets")
      .filter(col("DELETED_AT").isNull)
      .select("ID", "TITLE")
    assert(df.count() === 16) // 4 of 20 soft-deleted
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters:") && plan.contains("IsNull(DELETED_AT)"),
      s"soft-delete predicate not pushed to the database:\n$plan")
  }

  test("S2: partitioned read parallelizes and loses no rows outside bounds") {
    setup
    val df = Jdbc.partitionedTable(spark, conn, "tickets",
      partitionColumn = "ID", lowerBound = 5, upperBound = 15,
      numPartitions = 4)
    assert(df.rdd.getNumPartitions === 4)
    // bounds are split hints only: rows 1-4 and 16-20 still arrive
    assert(df.count() === 20)
    assert(df.agg(sum(col("ID"))).head.getLong(0) === (1 to 20).sum)
  }

  test("P2: point lookup pushes the equality predicate") {
    setup
    val df = Jdbc.table(spark, conn, "tickets").filter(col("ID") === 7)
    assert(df.count() === 1)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("EqualTo(ID,7)"), s"point predicate not pushed:\n$plan")
  }

  test("query: arbitrary SQL runs database-side") {
    setup
    val df = Jdbc.query(spark, conn,
      "SELECT count(*) AS n FROM tickets WHERE deleted_at IS NULL")
    assert(df.selectExpr("cast(N as long)").head.getLong(0) === 16)
  }

  test("S4: tableNames introspects the catalog") {
    setup
    val names = Jdbc.tableNames(spark, conn, schema = "APP")
    assert(names.map(_.toUpperCase).toSet === Set("TICKETS", "STATUSES"))
  }
}
