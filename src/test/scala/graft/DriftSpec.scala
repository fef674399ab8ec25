package graft

import org.apache.spark.sql.functions._

import graft.operators.Drift

class DriftSpec extends SparkSpec {
  import spark.implicits._

  private def psi(prev: Seq[Double], next: Seq[Double]): Double =
    Drift.psiBuckets(prev.toDF("v"), next.toDF("v"), "v")
      .agg(sum(col("psi_contrib"))).collect()(0).getDouble(0)

  test("identical distributions score ~0; a shifted one scores high") {
    val base = (0 until 1000).map(i => (i % 100).toDouble)
    val same = psi(base, base)
    assert(math.abs(same) < 0.001, s"identical snapshots scored $same")
    // mass moved into the top decile: classic PSI > 0.2 alarm
    val shifted = base.map(v => if (v < 50) v + 50 else v)
    assert(psi(base, shifted) > 0.2)
  }

  test("empty buckets stay finite (Laplace smoothing)") {
    // next occupies only the low half: upper buckets are prev-only
    val prev = (0 until 100).map(_.toDouble)
    val next = (0 until 50).map(_.toDouble)
    val out = psi(prev, next)
    assert(!out.isNaN && !out.isInfinite)
    assert(out > 0.0)
  }

  test("decomposition is symmetric up to sign of the shares") {
    val a = (0 until 500).map(i => (i % 97).toDouble)
    val b = (0 until 500).map(i => ((i * 7) % 89).toDouble)
    // PSI is symmetric: swapping snapshots gives the same total
    assert(math.abs(psi(a, b) - psi(b, a)) < 1e-9)
  }
}
