package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Text-analysis building blocks for large-scale training-data pipelines:
  * tokenization, shingling, quality signals, language-ID heuristics and
  * document fingerprints. Everything is a Catalyst `Column` expression
  * (array lambdas + built-ins — no UDFs), so the whole pipeline stays
  * inside whole-stage codegen and scales linearly with input splits:
  * no shuffle is introduced by any function here.
  *
  * Determinism note: scoring functions use only rational arithmetic
  * (+,-,*,/) on IEEE doubles — no transcendentals — so results are
  * bit-identical across engines (the DuckDB oracle reproduces them).
  */
object TextOps {

  /** Whitespace tokenization (single-space convention of the corpus). */
  def tokens(text: Column): Column = split(text, " ")

  /** k-word shingles: ["a","b","c","d"] k=3 -> ["a b c", "b c d"].
    *
    * Implemented as k shifted slices zipped together. The naive
    * formulation — indexing `toks` inside a per-position lambda — makes
    * Catalyst re-evaluate the tokenizer expression for every element
    * reference, turning shingling O(n^2) per document; slicing touches
    * the array expression only O(k) times per ROW.
    */
  def wordShingles(toks: Column, k: Int): Column = {
    require(k >= 1, s"shingle size must be >= 1, got $k")
    val len = greatest(size(toks) - (k - 1), lit(0))
    (0 until k).map(j => slice(toks, lit(j + 1), len))
      .reduce((x, y) => zip_with(x, y, (a, b) => concat(a, lit(" "), b)))
  }

  /** Token count of a document. */
  def tokenCount(text: Column): Column = size(tokens(text))

  /** GPT-2-style pre-tokenizer pattern: contraction suffixes, letter
    * runs, digit runs, punctuation runs (each optionally space-prefixed),
    * and residual whitespace. A cheap, deterministic stand-in for BPE
    * token counting when budgeting training data.
    */
  val BpePattern: String =
    "('s|'t|'re|'ve|'m|'ll|'d| ?[\\p{L}]+| ?[\\p{N}]+| ?[^\\s\\p{L}\\p{N}]+|\\s+)"

  /** BPE-ish token count via the pre-tokenizer regex. */
  def bpeTokenCount(text: Column): Column =
    size(regexp_extract_all(text, lit(BpePattern), lit(1)))

  /** Count of tokens that belong to `set`. */
  def tokenHits(toks: Column, set: Seq[String]): Column =
    size(filter(toks, t => t.isin(set.map(lit): _*)))

  /** Number of DISTINCT members of `set` present in `toks` — the shape
    * of Gopher's "contains at least 2 of the 8 common English words"
    * rule (hits of the same stopword don't accumulate).
    */
  def distinctTokenHits(toks: Column, set: Seq[String]): Column =
    size(array_intersect(toks, array(set.map(lit): _*)))

  /** Stopword ratio — classic quality signal. */
  def stopwordRatio(toks: Column, stopwords: Seq[String]): Column =
    tokenHits(toks, stopwords).cast("double") / size(toks).cast("double")

  /** Mean token length (chars excluding separators / token count). */
  def avgTokenLen(text: Column, toks: Column): Column =
    (length(text) - (size(toks) - lit(1))).cast("double") / size(toks).cast("double")

  /** Ratio of alphabetic chars to all chars. */
  def alphaRatio(text: Column): Column =
    length(regexp_replace(text, "[^a-zA-Z]", "")).cast("double") /
      length(text).cast("double")

  /** Composite quality score in [0,1]-ish: rational ops only. */
  def qualityScore(text: Column, toks: Column, stopwords: Seq[String]): Column = {
    val stop = stopwordRatio(toks, stopwords)
    val len = size(toks).cast("double")
    // reward presence of stopwords and longer docs, cap via x/(x+50)
    stop * lit(0.5) + (len / (len + lit(50.0))) * lit(0.5)
  }

  /** Language-ID: n-gram/stopword-hit heuristic — the language whose
    * marker-token set scores the most hits wins; ties broken by the
    * fixed language order. Marker sets are deliberately tiny: this is
    * the classic cheap LID pre-filter, not a model.
    */
  val LangMarkers: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "a", "of", "and", "is"),
    "es" -> Seq("el", "la", "de", "que", "y"),
    "de" -> Seq("der", "die", "das", "und", "ist"),
    "fr" -> Seq("le", "la", "de", "et", "est"),
    "zh" -> Seq("的", "了", "是", "我", "不"))

  def langId(toks: Column): Column = {
    // arg-max via array_max over (score, priority, lang) structs, which
    // compare field-by-field: highest score wins, ties go to the EARLIEST
    // marker list (priority = -index) — first-wins, same as a sequential
    // fold. The fold formulation this replaces referenced its accumulator
    // twice per step (condition + otherwise), doubling the expression
    // tree per language: 5 marker sets inlined every tokenHits lambda
    // ~16x, and the generated code took ~10 s of Janino compile on every
    // fresh JVM — a per-executor tax on a real cluster. Here each score
    // expression appears exactly once; codegen is linear in languages.
    val entries = LangMarkers.zipWithIndex.map { case ((lang, markers), i) =>
      struct(tokenHits(toks, markers).as("score"), lit(-i).as("prio"), lit(lang).as("lang"))
    }
    array_max(array(entries: _*)).getField("lang")
  }

  /** Document fingerprint: hash of the sorted distinct token set — robust
    * to word order and repetition (a cheap canonical-form rolling hash).
    */
  def fingerprint(toks: Column): Column =
    md5(concat_ws(" ", array_sort(array_distinct(toks))))

  /** Tracking query parameters a URL canonicalizer strips (with the
    * parameter's trailing '&' so the remaining query stays well-formed).
    * Java∩RE2 subset, like the PII patterns — the corpus must
    * canonicalize identically wherever it is audited.
    */
  val TrackingParamPattern: String = "(utm_[a-z]+|fbclid)=[^&#]*&?"

  /** URL canonicalization — the normalization pass before exact URL
    * dedup of a web corpus (the same page arrives as `HTTPS://Site.COM
    * :443/p/?utm_source=feed#top` and `https://site.com/p`): lowercase
    * scheme+host (NOT the path — paths are case-sensitive), strip
    * scheme-default ports, drop the fragment, strip tracking params,
    * clean the emptied query, collapse the path's trailing slash.
    * A pure narrow regexp chain — map tasks only at any scale; rule
    * ORDER is part of the contract (fragment before params before
    * query cleanup before slash), mirrored step-for-step by the
    * oracle.
    */
  def normalizeUrl(u: Column): Column = {
    val prefix = lower(regexp_extract(u, "^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*", 0))
    val noPort = regexp_replace(
      regexp_replace(prefix, "^(https://[^/?#:]*):443$", "$1"),
      "^(http://[^/?#:]*):80$", "$1")
    val rest = regexp_replace(u, "^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*", "")
    val cleaned =
      regexp_replace(                              // 5. trailing path slash
        regexp_replace(                            // 4. slash(es) before query
          regexp_replace(                          // 3. emptied/trailing query junk
            regexp_replace(                        // 2. tracking params
              regexp_replace(rest, "#.*$", ""),    // 1. fragment
              TrackingParamPattern, ""),
            "[?&]+$", ""),
          "/+\\?", "?"),
        "/$", "")
    concat(noPort, cleaned)
  }

  // =====================================================================
  // PII scrubbing — the pre-training redaction pass
  // =====================================================================

  /** PII patterns, deliberately written in the regex subset BOTH Java
    * (Spark codegen) and RE2-style engines (DuckDB, Go scanners) accept:
    * no lookaround, no backreferences — a redaction pass must behave
    * identically wherever the corpus is audited. Order of application
    * matters and is fixed: EMAIL first (its local part could otherwise
    * be chewed up by the phone pattern's digit runs), then PHONE, then
    * IPv4 (never matches inside an already-redacted token because the
    * placeholders carry no digits).
    */
  val EmailPattern: String = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val PhonePattern: String = "\\+[0-9]{1,3}-[0-9]{3}-[0-9]{3,4}-?[0-9]{0,4}"
  val Ipv4Pattern: String = "[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}"

  /** Redact emails, international-format phone numbers and IPv4
    * addresses to fixed placeholders. Pure `regexp_replace` chain —
    * narrow, codegen'd, no shuffle; the 100 TB shape is one scan in,
    * one scan out.
    */
  def redactPii(text: Column): Column = {
    val e = regexp_replace(text, EmailPattern, "<EMAIL>")
    val p = regexp_replace(e, PhonePattern, "<PHONE>")
    regexp_replace(p, Ipv4Pattern, "<IP>")
  }

  /** How many matches of `pattern` occur in `text` — the audit count a
    * redaction report aggregates per source/domain.
    */
  def piiCount(text: Column, pattern: String): Column =
    size(regexp_extract_all(text, lit(pattern), lit(0)))

  /** Exact cross-document substring dedup at `w`-token windows (the
    * Lee et al. 2022 "Deduplicating Training Data" granularity): every
    * w-token span whose digest occurs anywhere else in the corpus —
    * another doc or another position of the same doc — is removed
    * except at its canonical first occurrence (min (id, pos)), and the
    * surviving tokens reassemble into `clean_text`. Scale shape: gram
    * postings shuffle DIGESTS only (16-hex-char = 8-byte md5 prefixes,
    * never span
    * text); only count>1 digests (the duplicated minority) join back;
    * the canonical survivor falls out of a min over an integer-packed
    * (id, pos) — no window, no second corpus pass; per-doc removed-
    * span lists are doc-length-bounded arrays and the rebuild is one
    * array expression. `idCol` must be a non-negative integral id and
    * positions must fit under `posPack` (1e6 default — a 10⁶-token doc
    * bound, validated nowhere cheap, so callers with longer docs raise
    * it).
    */
  def substringDedup(
      docs: DataFrame,
      idCol: String,
      tokensCol: String,
      w: Int = 8,
      posPack: Long = 1000000L): DataFrame = {
    val d = docs.select(col(idCol), col(tokensCol).as("__tk"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val g = d.select(col(idCol), explode(when(size(col("__tk")) >= w,
        transform(sequence(lit(0), size(col("__tk")) - w),
          i => struct(i.as("pos"),
            substring(md5(concat_ws(" ", slice(col("__tk"), i + 1, lit(w)))), 1, 16)
              .as("dg"))))
        .otherwise(array().cast("array<struct<pos:int,dg:string>>"))).as("gr"))
      .select(col(idCol), col("gr.pos").as("pos"), col("gr.dg").as("dg"))
    val dup = g.groupBy(col("dg")).agg(count(lit(1)).as("cnt"),
        min(col(idCol) * posPack + col("pos")).as("canon"))
      .filter(col("cnt") > 1)
    val rem = g.join(dup, Seq("dg"))
      .filter(col(idCol) * posPack + col("pos") =!= col("canon"))
      .groupBy(col(idCol)).agg(sort_array(collect_set(col("pos"))).as("__starts"))
    val out = d.join(rem, Seq(idCol), "left")
      .withColumn("__starts", coalesce(col("__starts"), array().cast("array<int>")))
    val kept = filter(
      transform(col("__tk"), (t, j) => struct(t.as("t"), j.as("j"))),
      x => !exists(col("__starts"),
        s0 => s0 <= x.getField("j") && x.getField("j") <= s0 + (w - 1)))
    out.select(col(idCol),
      concat_ws(" ", transform(kept, x => x.getField("t"))).as("clean_text"),
      (size(col("__tk")) - size(kept)).cast("long").as("n_removed"))
  }
}
