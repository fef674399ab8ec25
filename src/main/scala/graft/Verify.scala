package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}
/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare. */
object Verify {
  def main(args: Array[String]): Unit = {
    val (sfDir, outDir) = (args(0), args(1))
    // optional 3rd arg (local dev only; the driver passes 2): comma-
    // separated query names — dump just those and skip the golden gates
    val only: Option[Set[String]] =
      if (args.length > 2) Some(args(2).split(",").toSet) else None
    val selected = SparkEntry.queries.filter { case (n, _) =>
      only.forall(_.contains(n)) }
    val spark = GraftSession("graft-verify")
    new java.io.File(outDir).mkdirs()
    selected.foreach { case (name, fn) =>
      try fn(spark, sfDir).coalesce(1).write.mode("overwrite")
        .parquet(s"$outDir/$name")
      catch { case e: Throwable =>
        System.err.println(s"[verify] $name failed: ${e.getMessage}")
      } finally StageCache.releaseAll() // query-owned caches die with the query
    }
    // JSON string escape: backslash, quote, and ALL control chars (<0x20)
    // — a tab or CR in builder-authored SQL would otherwise make the
    // driver's json.load fail and silently zero the round's correctness.
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    val json = SparkEntry.oracleSql
      .filter { case (k, _) => only.forall(_.contains(k)) }
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)

    if (only.isDefined) { spark.stop(); return }

    // Golden gate for the two queries DuckDB cannot express (murmur3 /
    // seeded hyperplanes): compare the dumped artifacts against the
    // independent plain-Scala models (graft.oracle.GoldenModels). A
    // mismatch fails the whole verify run — these queries do NOT ride on
    // a rows-only check.
    import graft.oracle.GoldenModels
    val simhashGot = spark.read.parquet(s"$outDir/dedup_simhash")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    val simhashWant = GoldenModels.simhashPairs(
      spark.read.parquet(s"$sfDir/documents.parquet")
        .select("doc_id", "text").collect()
        .map(r => (r.getLong(0), r.getString(1))).toSeq)
    require(simhashGot == simhashWant,
      s"[verify] golden MISMATCH dedup_simhash: spark=${simhashGot.size} " +
        s"model=${simhashWant.size} pairs, " +
        s"diff=${(simhashGot diff simhashWant).take(3)} / " +
        s"${(simhashWant diff simhashGot).take(3)}")
    println(s"[verify] golden PASS dedup_simhash (${simhashGot.size} pairs)")

    val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
      .select("vec_id", "embedding").collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1))).toSeq
    val lshGot = spark.read.parquet(s"$outDir/ann_lsh_topk")
      .collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getDouble(3)))
      .toSet
    val lshWant = GoldenModels.lshTopK(
      emb, emb.filter(_._1 < 10), k = 5, dim = 64)
    require(lshGot == lshWant,
      s"[verify] golden MISMATCH ann_lsh_topk: spark=${lshGot.size} " +
        s"model=${lshWant.size} rows, " +
        s"diff=${(lshGot diff lshWant).take(3)} / " +
        s"${(lshWant diff lshGot).take(3)}")
    println(s"[verify] golden PASS ann_lsh_topk (${lshGot.size} rows)")

    val bpeGot = spark.read.parquet(s"$outDir/bpe_train")
      .collect()
      .map(r => (r.getInt(0), r.getString(1), r.getString(2), r.getLong(3)))
      .sortBy(_._1).toSeq
    val bpeWant = GoldenModels.bpeMerges(
      spark.read.parquet(s"$sfDir/documents.parquet")
        .select("text").collect().map(_.getString(0)).toSeq,
      numMerges = 8)
    require(bpeGot == bpeWant,
      s"[verify] golden MISMATCH bpe_train: spark=$bpeGot model=$bpeWant")
    println(s"[verify] golden PASS bpe_train (${bpeGot.size} merges)")

    val encGot = spark.read.parquet(s"$outDir/bpe_encode")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val encWant = GoldenModels.bpeEncode(
      spark.read.parquet(s"$sfDir/documents.parquet")
        .select("doc_id", "text").collect()
        .map(r => (r.getLong(0), r.getString(1))).toSeq,
      bpeWant.map(m => (m._2, m._3)))
    require(encGot == encWant,
      s"[verify] golden MISMATCH bpe_encode: spark=${encGot.size} " +
        s"model=${encWant.size} rows, " +
        s"diff=${(encGot diff encWant).take(3)} / " +
        s"${(encWant diff encGot).take(3)}")
    println(s"[verify] golden PASS bpe_encode (${encGot.size} rows)")

    val vocGot = spark.read.parquet(s"$outDir/bpe_vocab")
      .collect().map(r => (r.getString(0), r.getLong(1)))
      .sortBy { case (s, f) => (-f, s) }.toSeq
    val vocWant = GoldenModels.bpeVocab(
      spark.read.parquet(s"$sfDir/documents.parquet")
        .select("text").collect().map(_.getString(0)).toSeq,
      bpeWant.map(m => (m._2, m._3)), k = 30)
    require(vocGot == vocWant,
      s"[verify] golden MISMATCH bpe_vocab: got=${vocGot.take(5)} " +
        s"want=${vocWant.take(5)}")
    println(s"[verify] golden PASS bpe_vocab (${vocGot.size} symbols)")
    spark.stop()
  }
}
