package graft.functions

import com.fasterxml.jackson.databind.JsonNode

/** A CUSTOM analysis chain — ES's settings-defined
  * `{"type": "custom", "tokenizer": ..., "filter": [...]}` analyzer
  * (reference deployment: ES 8.11 per docker-compose.yml:5, where
  * users define custom analyzers in index settings and name them
  * from mappings), shared by THREE surfaces so they cannot drift:
  *
  *   - `_analyze`'s explicit tokenizer/filter form (round 17's
  *     route, now delegating here),
  *   - index MAPPINGS: [[graft.sinks.SearchIndex]] accepts
  *     `analyzer = "custom"` plus a chain spec — documents tokenize
  *     through this chain at WRITE time (via the codegen
  *     [[org.apache.spark.sql.graft.ChainTokens]] expression) and
  *     queries analyze with the same chain,
  *   - the NORMALIZER form: a tokenizer-less `_analyze` body with
  *     filters is ES's custom normalizer — keyword tokenizer, ONE
  *     token, multi-term-aware filters only (`lowercase`, `elision`,
  *     `german_normalization`); token-splitting or token-dropping
  *     filters reject by name exactly as ES rejects them inside
  *     normalizers.
  *
  * Tokenizers: `standard` (the engine's token grammar, case KEPT —
  * lowercasing is a filter, like ES), `lowercase`, `letter`,
  * `whitespace`, `keyword`. Filters: `lowercase`, `stop` (named set
  * or explicit list — positions CONSUMED, Lucene's increments),
  * `elision`, `german_normalization`,
  * `{"type": "stemmer", "language": ...}`, and
  * `{"type": "edge_ngram", "min_gram": a, "max_gram": b}` — every
  * gram keeps its source token's position and offsets (Lucene's
  * EdgeNGramTokenFilter contract), the filter behind ES's
  * search-as-you-type / bool_prefix index chains. Anything else
  * rejects by name.
  *
  * The parsed [[Spec]] carries a CANONICAL JSON serialization —
  * what the index meta sidecar persists, so an index generation's
  * chain is part of its grammar exactly like the named analyzers. */
object CustomChain {

  sealed trait FilterSpec
  case object Lowercase extends FilterSpec
  /** `named` = a `_lang_` set (serialized by name); explicit lists
    * carry their words. */
  final case class Stop(named: Option[String],
                        words: Set[String]) extends FilterSpec {
    def isStop(t: String): Boolean = named match {
      case Some("_english_") => EnglishAnalysis.isStop(t)
      case Some("_french_")  => FrenchAnalysis.isStop(t)
      case Some("_german_")  => GermanAnalysis.isStop(t)
      case Some("_spanish_") => SpanishAnalysis.isStop(t)
      case _ => words.contains(t)
    }
  }
  case object Elision extends FilterSpec
  case object GermanNormalization extends FilterSpec
  final case class Stemmer(language: String) extends FilterSpec {
    def stem(t: String): String = language match {
      case "english" | "porter" => PorterStemmer.stem(t)
      case "french"             => FrenchStemmer.stem(t)
      case "light_french"       => FrenchLightStemmer.stem(t)
      case "light_german"       => GermanLightStemmer.stem(t)
      case "light_spanish"      => SpanishLightStemmer.stem(t)
      case other => throw new IllegalStateException(
        s"unreachable stemmer '$other' (parse validates)")
    }
  }
  final case class EdgeNgram(minGram: Int, maxGram: Int)
      extends FilterSpec

  final case class Spec(tokenizer: String, filters: Seq[FilterSpec]) {

    /** Canonical JSON — the sidecar form; [[parseJson]] round-trips
      * it. Explicit stop lists serialize sorted (set semantics). */
    lazy val json: String = {
      val fs = filters.map {
        case Lowercase => "\"lowercase\""
        case Stop(Some(n), _) =>
          s"""{"type": "stop", "stopwords": "$n"}"""
        case Stop(None, ws) =>
          // full JSON string escaping (backslashes, quotes, control
          // chars) — this serialization is PERSISTED in index metas,
          // so a stopword the writer can spell must round-trip
          val om = new com.fasterxml.jackson.databind.ObjectMapper()
          ws.toSeq.sorted.map(om.writeValueAsString)
            .mkString("{\"type\": \"stop\", \"stopwords\": [", ", ",
              "]}")
        case Elision => "\"elision\""
        case GermanNormalization => "\"german_normalization\""
        case Stemmer(l) => s"""{"type": "stemmer", "language": "$l"}"""
        case EdgeNgram(a, b) =>
          s"""{"type": "edge_ngram", "min_gram": $a, "max_gram": $b}"""
      }
      s"""{"tokenizer": "$tokenizer", "filter": [${fs.mkString(", ")}]}"""
    }
  }

  val Tokenizers: Set[String] =
    Set("standard", "lowercase", "letter", "whitespace", "keyword")

  val StemmerLanguages: Seq[String] =
    Seq("english", "porter", "french", "light_french", "light_german",
      "light_spanish")

  val NamedStopSets: Seq[String] =
    Seq("_english_", "_french_", "_german_", "_spanish_")

  private def keysOf(n: JsonNode): Seq[String] = {
    val it = n.fieldNames()
    val b = Seq.newBuilder[String]
    while (it.hasNext) b += it.next()
    b.result()
  }

  /** Parse one filter entry (a name string or a `{"type": ...}`
    * object). `normalizer` = the tokenizer-less `_analyze` form:
    * only multi-term-aware filters are legal (ES's custom-normalizer
    * rule — a stop/stemmer/edge_ngram inside a normalizer would
    * drop or split the single token, so they reject BY NAME). */
  def parseFilter(f: JsonNode, normalizer: Boolean,
                  fail: String => Nothing): FilterSpec = {
    val (kind, spec): (String, Option[JsonNode]) =
      if (f.isTextual) (f.asText, None)
      else if (f.isObject)
        (Option(f.get("type")).map(_.asText)
          .getOrElse(fail("filter object needs \"type\"")),
          Some(f))
      else fail("filter entries are names or {\"type\": ...}")
    if (normalizer &&
        (kind == "stop" || kind == "stemmer" || kind == "edge_ngram"))
      fail(s"filter '$kind' is not multi-term aware — a " +
        "tokenizer-less body is a NORMALIZER (keyword tokenizer; " +
        "lowercase, elision, german_normalization only); name a " +
        "tokenizer to run a full chain")
    kind match {
      case "lowercase" => Lowercase
      case "elision" => Elision
      case "german_normalization" => GermanNormalization
      case "stop" =>
        spec.foreach { s =>
          val unknown = keysOf(s).filterNot(Set("type", "stopwords"))
          if (unknown.nonEmpty)
            fail(s"unsupported stop filter key" +
              s"${if (unknown.size == 1) "" else "s"}: " +
              unknown.mkString(", "))
        }
        spec.flatMap(s => Option(s.get("stopwords"))) match {
          case None => Stop(Some("_english_"), Set.empty)
          case Some(n) if n.isTextual =>
            if (!NamedStopSets.contains(n.asText))
              fail(s"unsupported stopwords set '${n.asText}' " +
                s"(${NamedStopSets.mkString(", ")}, or an explicit " +
                "list)")
            Stop(Some(n.asText), Set.empty)
          case Some(n) if n.isArray =>
            Stop(None, (0 until n.size).map(n.get(_).asText).toSet)
          case Some(_) =>
            fail("stopwords must be a named set or a list")
        }
      case "stemmer" =>
        val s = spec.getOrElse(
          fail("stemmer takes the object form with \"language\""))
        val unknown = keysOf(s).filterNot(Set("type", "language"))
        if (unknown.nonEmpty)
          fail(s"unsupported stemmer key" +
            s"${if (unknown.size == 1) "" else "s"}: " +
            unknown.mkString(", "))
        val lang = Option(s.get("language")).map(_.asText)
          .getOrElse(fail("stemmer needs \"language\""))
        if (!StemmerLanguages.contains(lang))
          fail(s"unsupported stemmer language '$lang' " +
            s"(${StemmerLanguages.mkString(", ")})")
        Stemmer(lang)
      case "edge_ngram" =>
        val s = spec.getOrElse(
          fail("edge_ngram takes the object form with " +
            "min_gram/max_gram"))
        val unknown = keysOf(s)
          .filterNot(Set("type", "min_gram", "max_gram"))
        if (unknown.nonEmpty)
          fail(s"unsupported edge_ngram key" +
            s"${if (unknown.size == 1) "" else "s"}: " +
            unknown.mkString(", "))
        val a = Option(s.get("min_gram")).map(_.asInt).getOrElse(1)
        val b = Option(s.get("max_gram")).map(_.asInt).getOrElse(2)
        if (a < 1 || b < a)
          fail("edge_ngram needs 1 <= min_gram <= max_gram")
        EdgeNgram(a, b)
      case other => fail(s"unsupported filter '$other' (lowercase, " +
        "stop, elision, german_normalization, stemmer, edge_ngram)")
    }
  }

  /** Parse a whole chain node `{"tokenizer": ..., "filter": [...]}`.
    * The tokenizer is REQUIRED here (ES custom analyzers require
    * one; `_analyze`'s tokenizer-less normalizer form supplies
    * "keyword" itself). */
  def parseNode(node: JsonNode, fail: String => Nothing): Spec = {
    val unknown = keysOf(node).filterNot(Set("tokenizer", "filter"))
    if (unknown.nonEmpty)
      fail(s"unsupported custom-chain key" +
        s"${if (unknown.size == 1) "" else "s"}: " +
        unknown.mkString(", "))
    val tok = Option(node.get("tokenizer")).map(_.asText)
      .getOrElse(fail("a custom analysis chain needs \"tokenizer\""))
    if (!Tokenizers.contains(tok))
      fail(s"unsupported tokenizer '$tok' " +
        s"(${Tokenizers.toSeq.sorted.mkString(", ")})")
    val filters: Seq[JsonNode] = Option(node.get("filter")) match {
      case None => Nil
      case Some(fn) if fn.isArray => (0 until fn.size).map(fn.get)
      case Some(_) => fail("filter must be an array")
    }
    Spec(tok, filters.map(parseFilter(_, normalizer = false, fail)))
  }

  /** Re-parse a canonical sidecar serialization ([[Spec.json]]) —
    * trusted input; malformed metas fail loud. */
  def parseJson(json: String): Spec =
    parseNode(
      new com.fasterxml.jackson.databind.ObjectMapper().readTree(json),
      msg => throw new IllegalArgumentException(
        s"invalid persisted custom chain: $msg"))

  private val TokenPattern =
    java.util.regex.Pattern.compile(TextFunctions.AnalyzerPattern)
  private val LetterRun =
    java.util.regex.Pattern.compile("\\p{L}+")
  private val SpaceRun = java.util.regex.Pattern.compile("\\S+")

  /** Run the chain on `text` → (token, startOffset, endOffset,
    * position). Offsets index the ORIGINAL text (ES's `_analyze`
    * contract); positions are the tokenizer's slots with
    * stop-consumed gaps (Lucene's increments); edge_ngram grams
    * share their source token's offsets AND position. */
  def run(spec: Spec, text: String): Seq[(String, Int, Int, Int)] = {
    var toks: Seq[(String, Int, Int, Int)] = spec.tokenizer match {
      case "standard" =>
        val m = TokenPattern.matcher(text)
        val out = scala.collection.mutable.ArrayBuffer
          .empty[(String, Int, Int, Int)]
        while (m.find()) out += ((m.group, m.start, m.end, out.length))
        out.toSeq
      case "lowercase" | "letter" =>
        val m = LetterRun.matcher(text)
        val out = scala.collection.mutable.ArrayBuffer
          .empty[(String, Int, Int, Int)]
        while (m.find()) {
          val t = if (spec.tokenizer == "lowercase") m.group.toLowerCase
                  else m.group
          out += ((t, m.start(), m.end(), out.length))
        }
        out.toSeq
      case "whitespace" =>
        val m = SpaceRun.matcher(text)
        val out = scala.collection.mutable.ArrayBuffer
          .empty[(String, Int, Int, Int)]
        while (m.find()) out += ((m.group, m.start, m.end, out.length))
        out.toSeq
      case "keyword" =>
        if (text.isEmpty) Seq.empty else Seq((text, 0, text.length, 0))
      case other => throw new IllegalStateException(
        s"unreachable tokenizer '$other' (parse validates)")
    }
    spec.filters.foreach {
      case Lowercase =>
        toks = toks.map { case (t, s0, e0, p) =>
          (t.toLowerCase, s0, e0, p) }
      case st: Stop =>
        toks = toks.filterNot { case (t, _, _, _) => st.isStop(t) }
      case Elision =>
        toks = toks.flatMap { case (t, s0, e0, p) =>
          val el = FrenchAnalysis.elide(t)
          if (el.isEmpty) None else Some((el, s0, e0, p))
        }
      case GermanNormalization =>
        toks = toks.map { case (t, s0, e0, p) =>
          (GermanAnalysis.normalize(t), s0, e0, p) }
      case st: Stemmer =>
        toks = toks.map { case (t, s0, e0, p) => (st.stem(t), s0, e0, p) }
      case EdgeNgram(a, b) =>
        toks = toks.flatMap { case (t, s0, e0, p) =>
          // grams a..min(b, len); a token shorter than min_gram
          // emits nothing (Lucene EdgeNGramTokenFilter)
          (a to math.min(b, t.length)).map(g =>
            (t.substring(0, g), s0, e0, p))
        }
    }
    toks
  }

  /** (term, position) view of [[run]] — what the index/query sides
    * consume. */
  def analyzeWithPositions(spec: Spec, text: String): Seq[(String, Int)] =
    run(spec, text).map { case (t, _, _, p) => (t, p) }
}
