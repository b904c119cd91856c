package graft.text

/** Text-analysis / dedup building blocks over the `documents` table
  * (beyond-reference roadmap, SURVEY §7.5): tokenization, rolling-hash
  * fingerprints, shingles, MinHash+LSH, SimHash, quality and language
  * heuristics.
  *
  * Every operator is defined ONCE as constants here and rendered TWICE —
  * a Spark SQL expression ([[spark]]) and a DuckDB oracle ([[duck]]) —
  * so the driver's hash-compare sees bit-identical integer results. All
  * hashes are polynomial rolling hashes mod [[P]] (exact in 64-bit
  * integer arithmetic in both engines; no engine-specific hash()).
  *
  * Scale notes: everything here is a per-row projection (no shuffle) until
  * the LSH band join; the band join shuffles on (band, hash) — bounded by
  * rows×bands, never O(n²). Candidate verification joins back to the
  * shingle arrays by doc_id — at 100 TB those joins are AQE-skew-safe
  * because band-bucket sizes are capped by near-dup cluster sizes.
  */
object TextOps {

  /** Modulus for all polynomial hashes: fits products in 64-bit ints. */
  val P = 1000000007L
  /** Char multiplier (token hash) and token multiplier (doc fingerprint). */
  val CharMul = 31L
  val TokMul = 131L

  /** MinHash config: K permutations h_j(x) = (a_j·x + b_j) mod P, banded
    * into Bands groups of RowsPerBand.
    */
  val K = 16
  val Bands = 4
  val RowsPerBand = 4
  /** Deterministic permutation constants (odd, < P). */
  val As: Seq[Long] = (0 until K).map(j => 2L * j * j + 3L * j + 7L)
  val Bs: Seq[Long] = (0 until K).map(j => 5L * j * j + j + 11L)

  /** Shingle width for near-dup (token 3-grams). */
  val ShingleW = 3

  /** Character n-gram width for the n-gram-Jaccard dedup variant. 5 chosen
    * empirically: 3-grams saturate on same-language text (most random doc
    * pairs share >50% of trigrams), 5-grams separate near-dups (J ≈ 0.99)
    * from unrelated text (J < 0.3) cleanly.
    */
  val NgramW = 5

  /** Stopword list for quality scoring (subset of English function words
    * present in the synthetic corpus).
    */
  val Stopwords: Seq[String] = Seq("the", "a", "of", "and", "to", "in", "is")

  /** Marker words per language for the n-gram/stopword lang-ID heuristic;
    * deterministic priority order for ties (first wins).
    */
  val LangMarkers: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "a", "and", "of", "fast", "slow", "small", "big"),
    "de" -> Seq("der", "die", "das", "und", "ist", "nicht"),
    "es" -> Seq("el", "la", "los", "que", "es", "una"),
    "fr" -> Seq("le", "les", "des", "est", "une", "avec"),
    "zh" -> Seq("de", "shi", "bu", "le", "zai", "you"))

  /** BPE-ish token regex: letter runs, digit runs, single other glyphs. */
  val BpeRegex = "[a-z]+|[0-9]+|[^a-z0-9\\s]"

  // ------------------------------------------------------- typed kernels

  /** SimHash (32-bit) of one document — the typed-kernel twin of the
    * `d_simhash` DuckDB oracle: tokens = split(lower(text), '\s+') keeping
    * empties (hash 0), per-token rolling hash (a·31 + codepoint) mod [[P]],
    * bit-majority over ALL token hashes including duplicates.
    *
    * This runs inside `mapPartitions` as a single narrow pass — the
    * interpreted higher-order-function expression plan it replaces
    * (explode + per-char `aggregate` lambda + 32 CASE sums) was ~100×
    * slower CPU-bound work for identical output.
    */
  def simhash32(text: String): Long = {
    val toks = text.toLowerCase(java.util.Locale.ROOT).split("\\s+", -1)
    val bitSums = new Array[Long](32)
    var i = 0
    while (i < toks.length) {
      val h = tokenHash(toks(i))
      var b = 0
      while (b < 32) {
        bitSums(b) += (if (((h >> b) & 1L) == 1L) 1L else -1L)
        b += 1
      }
      i += 1
    }
    var out = 0L
    var b = 0
    while (b < 32) { if (bitSums(b) > 0L) out |= 1L << b; b += 1 }
    out
  }

  /** Rolling hash of one (already-lowercased) token, iterating CODEPOINTS —
    * the expression plan (`split(t,'')` + `ascii(ch)`) and the DuckDB
    * oracle (`string_split` + `ord(ch)`) both hash per-codepoint, so a
    * surrogate pair must contribute ONE value here too, not two code
    * units.
    */
  def tokenHash(t: String): Long = {
    var h = 0L
    var j = 0
    while (j < t.length) {
      val cp = t.codePointAt(j)
      h = (h * CharMul + cp) % P
      j += Character.charCount(cp)
    }
    h
  }

  /** Distinct token-3-gram shingle hashes of one document — the typed twin
    * of [[spark.shinglesFromHashes]]∘[[spark.tokenHashes]] (and of the
    * DuckDB `sh_t` CTE): tokens = `split(lower(text), '\s+')` keeping
    * empties, per-token rolling hash, 3-gram rolling combine mod [[P]],
    * first-occurrence-distinct. Runs inside `mapPartitions` as one narrow
    * pass; the interpreted HOF expression chain it replaces was the
    * dominant cost of `d_minhash`/`d_lsh_pairs` (same ~100× CPU gap the
    * simhash kernel closed).
    */
  def shingles(text: String): Array[Long] = {
    val toks = text.toLowerCase(java.util.Locale.ROOT).split("\\s+", -1)
    val n = toks.length
    if (n < ShingleW) return Array.emptyLongArray
    val hs = new Array[Long](n)
    var i = 0
    while (i < n) { hs(i) = tokenHash(toks(i)); i += 1 }
    val seen = new java.util.LinkedHashSet[java.lang.Long]()
    i = 0
    while (i <= n - ShingleW) {
      val sh = ((hs(i) * TokMul + hs(i + 1)) % P * TokMul + hs(i + 2)) % P
      seen.add(sh)
      i += 1
    }
    val out = new Array[Long](seen.size)
    val it = seen.iterator()
    i = 0
    while (it.hasNext) { out(i) = it.next(); i += 1 }
    out
  }

  /** Distinct character-[[NgramW]]-gram rolling hashes of one document —
    * the n-gram-Jaccard dedup signal (typed twin of the DuckDB `ng_t`
    * CTE): codepoints of lower(text) INCLUDING whitespace (both engines
    * split on '' keeping every glyph), W-gram rolling combine mod [[P]],
    * first-occurrence-distinct. One narrow pass per row.
    */
  def charNgrams(text: String): Array[Long] = {
    val t = text.toLowerCase(java.util.Locale.ROOT)
    // codepoint array (surrogate pairs contribute one value, like tokenHash)
    val cps = new Array[Long](t.codePointCount(0, t.length))
    var j = 0
    var i = 0
    while (j < t.length) {
      val cp = t.codePointAt(j)
      cps(i) = cp.toLong
      i += 1
      j += Character.charCount(cp)
    }
    val n = cps.length
    if (n < NgramW) return Array.emptyLongArray
    val seen = new java.util.LinkedHashSet[java.lang.Long]()
    i = 0
    while (i <= n - NgramW) {
      var h = cps(i)
      var k = 1
      while (k < NgramW) { h = (h * CharMul + cps(i + k)) % P; k += 1 }
      seen.add(h)
      i += 1
    }
    val out = new Array[Long](seen.size)
    val it = seen.iterator()
    i = 0
    while (it.hasNext) { out(i) = it.next(); i += 1 }
    out
  }

  // ---------------------------------------------------------------- Spark

  /** Spark SQL expression strings (used via selectExpr/expr). `c` is the
    * text column name.
    */
  object spark {
    def tokens(c: String): String = s"split(lower($c), '\\\\s+')"

    /** Rolling hash of one token expression `t`. Spark's split('abc','')
      * yields a trailing empty string (Java split limit -1); DuckDB's does
      * not — filter empties so both engines hash the same char sequence.
      */
    def tokenHash(t: String): String =
      s"aggregate(filter(split($t, ''), ch -> ch <> ''), CAST(0 AS BIGINT), " +
        s"(a, ch) -> (a * $CharMul + ascii(ch)) % $P)"

    /** Array of token hashes for the document. */
    def tokenHashes(c: String): String =
      s"transform(${tokens(c)}, t -> ${tokenHash("t")})"

    /** Doc fingerprint: rolling hash over token hashes (D-fingerprint). */
    def fingerprint(c: String): String =
      s"aggregate(${tokenHashes(c)}, CAST(0 AS BIGINT), " +
        s"(acc, h) -> (acc * $TokMul + h) % $P)"

    /** Distinct token-3-gram shingle hashes from a column `hs` that holds
      * the token-hash array (empty array when < W tokens).
      */
    def shinglesFromHashes(hs: String): String =
      s"array_distinct(CASE WHEN size($hs) >= $ShingleW THEN " +
        s"transform(sequence(0, size($hs) - $ShingleW), i -> " +
        s"((element_at($hs, i + 1) * $TokMul + element_at($hs, i + 2)) * $TokMul " +
        s"+ element_at($hs, i + 3)) % $P) " +
        s"ELSE slice(transform(sequence(0, 0), i -> CAST(0 AS BIGINT)), 1, 0) END)"

    /** MinHash signature entry j over a shingle-array expression `sh`. */
    def minhash(sh: String, j: Int): String =
      s"array_min(transform($sh, x -> (${As(j)} * x + ${Bs(j)}) % $P))"

    /** Band hash b over a signature array expression `sig` (1-indexed). */
    def bandHash(sig: String, b: Int): String = {
      val lo = b * RowsPerBand
      (lo until lo + RowsPerBand)
        .map(j => s"element_at($sig, ${j + 1})")
        .reduceLeft((acc, x) => s"(($acc) * $TokMul + $x) % $P")
    }
  }

  // --------------------------------------------------------------- DuckDB

  /** DuckDB oracle SQL fragments mirroring [[spark]] exactly. list_reduce
    * has no initial accumulator, so fold(0, xs) is written
    * list_reduce(list_prepend(0, xs), f).
    */
  object duck {
    def tokens(c: String): String = s"string_split_regex(lower($c), '\\s+')"

    def tokenHash(t: String): String =
      s"list_reduce(list_prepend(CAST(0 AS BIGINT), " +
        s"list_transform(string_split($t, ''), ch -> CAST(ord(ch) AS BIGINT))), " +
        s"(a, ch) -> (a * $CharMul + ch) % $P)"

    def tokenHashes(c: String): String =
      s"list_transform(${tokens(c)}, t -> ${tokenHash("t")})"

    def fingerprint(c: String): String =
      s"list_reduce(list_prepend(CAST(0 AS BIGINT), ${tokenHashes(c)}), " +
        s"(acc, h) -> (acc * $TokMul + h) % $P)"

    def shinglesFromHashes(hs: String): String =
      s"list_distinct(CASE WHEN len($hs) >= $ShingleW THEN " +
        s"list_transform(range(0, len($hs) - ${ShingleW - 1}), i -> " +
        s"(($hs[i + 1] * $TokMul + $hs[i + 2]) * $TokMul + $hs[i + 3]) % $P) " +
        s"ELSE [] END)"

    def minhash(sh: String, j: Int): String =
      s"list_min(list_transform($sh, x -> (${As(j)} * x + ${Bs(j)}) % $P))"

    /** Codepoint array of lower(`c`) — step 1 of the n-gram oracle. */
    def charCodes(c: String): String =
      s"list_transform(string_split(lower($c), ''), ch -> CAST(ord(ch) AS BIGINT))"

    /** Distinct char-[[NgramW]]-gram hashes from a codepoint-array column
      * `cs` — step 2; together the oracle twin of [[TextOps.charNgrams]].
      */
    def ngramsFromCodes(cs: String): String = {
      val roll = (1 until NgramW).foldLeft(s"$cs[i + 1]") { (acc, k) =>
        s"(($acc) * $CharMul + $cs[i + ${k + 1}]) % $P"
      }
      s"list_distinct(CASE WHEN len($cs) >= $NgramW THEN " +
        s"list_transform(range(0, len($cs) - ${NgramW - 1}), i -> $roll) " +
        s"ELSE [] END)"
    }

    def bandHash(sig: String, b: Int): String = {
      val lo = b * RowsPerBand
      (lo until lo + RowsPerBand)
        .map(j => s"$sig[${j + 1}]")
        .reduceLeft((acc, x) => s"(($acc) * $TokMul + $x) % $P")
    }
  }
}
