package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions.{lit, shiftright}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, ExpectsInputTypes, Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.classic.GraftBridge
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType, LongType, StringType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** Static kernels shared by interpreted eval and generated code. Keeping the
  * body in one static method means whole-stage codegen emits a single
  * monomorphic call — the expression stays inside the WholeStageCodegen span.
  *
  * `polyHash` is the engine-wide deterministic hash: a left fold of
  * `h = (h*31 + codePoint) mod 1e9+7`. The modulus keeps every intermediate
  * inside 63 bits (max h*31+cp < 3.2e10), which is what makes the DuckDB
  * oracle able to mirror it exactly — DuckDB BIGINT arithmetic traps on
  * overflow instead of wrapping, so a wrapping 64-bit hash could never be
  * verified there.
  */
object Kernels {
  val HashPrime: Long = 1000000007L

  def polyHash(str: String): Long = {
    var h = 0L
    var i = 0
    val n = str.length
    while (i < n) {
      val cp = str.codePointAt(i)
      h = (h * 31L + cp) % HashPrime
      i += Character.charCount(cp)
    }
    h
  }

  def polyHash(s: UTF8String): Long = polyHash(s.toString)

  /** One-pass shingle + MinHash kernel: tokenize (single-space split, -1
    * limit — the exact semantics of Spark's `split(text, " ")` and DuckDB's
    * `string_split`), build distinct k-token shingles in first-occurrence
    * order (matching `array_distinct`), polyHash each, and fold the
    * `numHashes` permuted minima. Replaces a nested higher-order-function
    * pipeline that Spark evaluated interpreted AND re-evaluated once per
    * outer permutation — this kernel hashes each shingle exactly once.
    *
    * Returns struct(sh: array<long>, sig: array<long>): the DISTINCT
    * shingle HASHES (≈400 B/doc — what the exact-Jaccard verification
    * compares; caching the shingle strings instead measured 4× slower on a
    * 200k-doc corpus) and the signature the LSH banding slices. The dedup
    * contract is Jaccard over distinct hashed shingles, which the DuckDB
    * oracle mirrors exactly (list_distinct of the same polyHash).
    */
  def shingleMinhash(text: UTF8String, k: Int, numHashes: Int): InternalRow = {
    val toks = text.toString.split(" ", -1)
    val n = toks.length
    val last = math.max(n - k, 0)
    val seen = new java.util.LinkedHashSet[String]((last + 1) * 2)
    var i = 0
    while (i <= last) {
      val end = math.min(i + k, n)
      val sb = new java.lang.StringBuilder(32)
      var j = i
      while (j < end) {
        if (j > i) sb.append(' ')
        sb.append(toks(j))
        j += 1
      }
      seen.add(sb.toString)
      i += 1
    }
    val hashSet = new java.util.LinkedHashSet[java.lang.Long](seen.size * 2)
    val it = seen.iterator()
    while (it.hasNext) hashSet.add(polyHash(it.next()))
    val m = hashSet.size
    val hashes = new Array[Long](m)
    val hit = hashSet.iterator()
    var s = 0
    while (hit.hasNext) { hashes(s) = hit.next(); s += 1 }
    val sig = new Array[Long](numHashes)
    var p = 0
    while (p < numHashes) {
      val a = 2L * p + 1L
      val b = (p.toLong * p * 31L + 7L) % HashPrime
      var mn = Long.MaxValue
      var q = 0
      while (q < m) {
        val v = (hashes(q) * a + b) % HashPrime
        if (v < mn) mn = v
        q += 1
      }
      sig(p) = mn
      p += 1
    }
    new GenericInternalRow(
      Array[Any](new GenericArrayData(hashes), new GenericArrayData(sig))
    )
  }

  /** One-pass winnowing kernel (Schleimer, Wilkerson & Aiken, "Winnowing:
    * Local Algorithms for Document Fingerprinting", SIGMOD 2003): positional
    * k-token shingle hashes (NOT deduplicated — winnowing needs positions),
    * sliding-window minimum over `w` consecutive hashes via a monotonic
    * deque, distinct minima in first-window-occurrence order.
    *
    * Semantically equal to the composable form
    * `array_distinct(transform(windows, j -> array_min(slice(hashes, j+1, w))))`
    * that the DuckDB oracle replays — but O(n) amortized instead of
    * O(n·w), and the hash array is computed once (the HOF form re-evaluates
    * the whole positional-hash pipeline on every window because the array
    * sits inside the lambda body, not in the transform argument).
    *
    * The selected set is "every window's minimum VALUE": tie-breaking
    * position rules (rightmost-min in the paper) pick among equal values,
    * so the value SET — which is all a set-intersection copy detector
    * compares — is identical. A document shorter than one full window
    * contributes the minimum of what it has (mirroring `slice`'s tail
    * semantics).
    */
  def winnow(text: UTF8String, k: Int, w: Int): GenericArrayData = {
    // validated here, not just in TextFunctions.winnow, because the SQL
    // function path (winnow_fps) reaches the kernel directly
    if (k <= 0 || w <= 0)
      throw new IllegalArgumentException(s"winnow needs k > 0 and w > 0, got k=$k w=$w")
    val toks = text.toString.split(" ", -1)
    val n = toks.length
    val last = math.max(n - k, 0)
    val m = last + 1
    // positional shingle hash = polyHash of the ' '-joined k tokens,
    // folded incrementally so no shingle string is materialized
    val hashes = new Array[Long](m)
    var i = 0
    while (i <= last) {
      val end = math.min(i + k, n)
      var h = 0L
      var j = i
      while (j < end) {
        if (j > i) h = (h * 31L + 32L) % HashPrime // ' ' separator codepoint
        val s = toks(j)
        var ci = 0
        val sn = s.length
        while (ci < sn) {
          val cp = s.codePointAt(ci)
          h = (h * 31L + cp) % HashPrime
          ci += Character.charCount(cp)
        }
        j += 1
      }
      hashes(i) = h
      i += 1
    }
    // sliding-window minimum: deque of indices with increasing hash values
    val we = math.min(w, m) // effective window (short-doc tail semantics)
    val out = new java.util.LinkedHashSet[java.lang.Long](16)
    val deque = new Array[Int](m)
    var head = 0
    var tail = 0
    var idx = 0
    while (idx < m) {
      while (tail > head && hashes(deque(tail - 1)) >= hashes(idx)) tail -= 1
      deque(tail) = idx
      tail += 1
      val wStart = idx - we + 1 // window [wStart, idx] complete once wStart >= 0
      if (wStart >= 0) {
        while (deque(head) < wStart) head += 1
        out.add(hashes(deque(head)))
      }
      idx += 1
    }
    val res = new Array[Long](out.size)
    val it = out.iterator()
    var r = 0
    while (it.hasNext) { res(r) = it.next(); r += 1 }
    new GenericArrayData(res)
  }

  /** Positional k-token windows as STRINGS, one pass, O(n·k): tokenize
    * once (single-space split, -1 limit — Spark's `split(text, " ")`
    * semantics), emit the ' '-joined window at every position 0..n−k
    * (clamped to one whole-text window for shorter docs). Replaces the
    * HOF composition `transform(sequence(…), i -> concat_ws(slice(t…)))`,
    * which re-evaluates `split(text)` ONCE PER WINDOW because the token
    * array sits inside the lambda body, not in the transform argument
    * (the same pitfall [[winnow]] documents) — quadratic in document
    * length: a 100k-token self-duplicated document measured 1443 s
    * through the HOF path in the r06 scale smoke.
    */
  def positionalShingles(text: UTF8String, k: Int): GenericArrayData = {
    if (k <= 0)
      throw new IllegalArgumentException(s"positionalShingles needs k > 0, got $k")
    val toks = text.toString.split(" ", -1)
    val n = toks.length
    val last = math.max(n - k, 0)
    val out = new Array[Any](last + 1)
    var i = 0
    while (i <= last) {
      val end = math.min(i + k, n)
      val sb = new java.lang.StringBuilder(32)
      var j = i
      while (j < end) {
        if (j > i) sb.append(' ')
        sb.append(toks(j))
        j += 1
      }
      out(i) = UTF8String.fromString(sb.toString)
      i += 1
    }
    new GenericArrayData(out)
  }

  /** Overlapping fixed-stride token tiling as STRINGS, one pass — the
    * chunking unit (q58) and the segment-dedup tile. Same HOF-lambda
    * pitfall as [[positionalShingles]], milder exponent (n²/step).
    * Chunk i covers tokens [i·(size−overlap), i·(size−overlap)+size);
    * ⌈n/step⌉ chunks, min 1 (the whole-text clamp for short docs).
    */
  def chunks(text: UTF8String, chunkSize: Int, overlap: Int): GenericArrayData = {
    if (chunkSize <= 0 || overlap < 0 || overlap >= chunkSize)
      throw new IllegalArgumentException(
        s"chunks needs 0 <= overlap < chunkSize, got chunkSize=$chunkSize overlap=$overlap"
      )
    val step = chunkSize - overlap
    val toks = text.toString.split(" ", -1)
    val n = toks.length
    val nChunks = math.max((n + step - 1) / step, 1)
    val out = new Array[Any](nChunks)
    var i = 0
    while (i < nChunks) {
      val start = i * step
      val end = math.min(start + chunkSize, n)
      val sb = new java.lang.StringBuilder(32)
      var j = start
      while (j < end) {
        if (j > start) sb.append(' ')
        sb.append(toks(j))
        j += 1
      }
      out(i) = UTF8String.fromString(sb.toString)
      i += 1
    }
    new GenericArrayData(out)
  }

  /** Positional k-token window HASHES — [[winnow]]'s incremental
    * per-window polyHash fold without the winnowing: bit-identical to
    * `transform(positionalShingles(text, k), polyHash)` with no window
    * string ever materialized.
    */
  /** One-pass char-trigram/bigram-prefix pair hashes for langid
    * ([[graft.operators.LangId.gramPairs]]): one struct(p, g) per window
    * start i in 1..max(len−2, 1) — p = polyHash(substring(text, i, 2)),
    * g = polyHash(substring(text, i, 3)), codepoint positions, windows
    * clamped at the text end (substring semantics), empty text yields
    * one (0, 0) pair. Replaces a transform/zip_with/slice HOF pipeline
    * that Spark evaluated interpreted per element — the langid scoring
    * chain was the bench's most expensive query family purely from that
    * interpretation overhead (q148 7.1 s → the codegen'd kernel walks
    * the codepoints once).
    */
  def charGramPairHashes(text: UTF8String): GenericArrayData = {
    val s = text.toString
    val sn = s.length
    var n = 0
    var ci = 0
    while (ci < sn) { ci += Character.charCount(s.codePointAt(ci)); n += 1 }
    val cps = new Array[Int](n)
    ci = 0
    var k = 0
    while (ci < sn) {
      val cp = s.codePointAt(ci)
      cps(k) = cp
      k += 1
      ci += Character.charCount(cp)
    }
    val m = math.max(n - 2, 1)
    val out = new Array[Any](m)
    var i = 0
    while (i < m) {
      val e2 = math.min(i + 2, n)
      val e3 = math.min(i + 3, n)
      var p = 0L
      var g = 0L
      var j = i
      while (j < e2) { p = (p * 31L + cps(j)) % HashPrime; j += 1 }
      j = i
      while (j < e3) { g = (g * 31L + cps(j)) % HashPrime; j += 1 }
      out(i) = new GenericInternalRow(Array[Any](p, g))
      i += 1
    }
    new GenericArrayData(out)
  }

  /** Positional char-n-gram polyHashes — the codegen'd form of
    * [[graft.operators.LangId.charGramsExpr]] (windows at 1..max(len−n+1,
    * 1), clamped at the text end, empty text → one 0 hash). One codepoint
    * walk; same interpretation-overhead story as
    * [[charGramPairHashes]].
    */
  def charGramHashes(text: UTF8String, n: Int): GenericArrayData = {
    if (n <= 0) throw new IllegalArgumentException(s"charGramHashes needs n > 0, got $n")
    val s = text.toString
    val sn = s.length
    var len = 0
    var ci = 0
    while (ci < sn) { ci += Character.charCount(s.codePointAt(ci)); len += 1 }
    val cps = new Array[Int](len)
    ci = 0
    var k = 0
    while (ci < sn) {
      val cp = s.codePointAt(ci)
      cps(k) = cp
      k += 1
      ci += Character.charCount(cp)
    }
    val m = math.max(len - (n - 1), 1)
    val out = new Array[Long](m)
    var i = 0
    while (i < m) {
      val e = math.min(i + n, len)
      var h = 0L
      var j = i
      while (j < e) { h = (h * 31L + cps(j)) % HashPrime; j += 1 }
      out(i) = h
      i += 1
    }
    new GenericArrayData(out)
  }

  def positionalShingleHashes(text: UTF8String, k: Int): GenericArrayData = {
    if (k <= 0)
      throw new IllegalArgumentException(s"positionalShingleHashes needs k > 0, got $k")
    val toks = text.toString.split(" ", -1)
    val n = toks.length
    val last = math.max(n - k, 0)
    val hashes = new Array[Long](last + 1)
    var i = 0
    while (i <= last) {
      val end = math.min(i + k, n)
      var h = 0L
      var j = i
      while (j < end) {
        if (j > i) h = (h * 31L + 32L) % HashPrime // ' ' separator codepoint
        val s = toks(j)
        var ci = 0
        val sn = s.length
        while (ci < sn) {
          val cp = s.codePointAt(ci)
          h = (h * 31L + cp) % HashPrime
          ci += Character.charCount(cp)
        }
        j += 1
      }
      hashes(i) = h
      i += 1
    }
    new GenericArrayData(hashes)
  }

  /** Unicode NFC + whitespace canonicalization in one pass: runs of
    * space/tab/newline/carriage-return collapse to a single space, leading
    * and trailing runs drop, then the result composes to NFC
    * (java.text.Normalizer — the same Unicode normalization DuckDB's
    * `nfc_normalize` implements via utf8proc, so the oracle replays it).
    * The canonical first step of a C4/CCNet-style pipeline: dedup and
    * fingerprinting upstream of normalization would miss byte-different
    * but canonically-equal copies (decomposed accents, NBSP variants,
    * CRLF vs LF).
    *
    * The whitespace class is the EXPLICIT [ \t\n\r] — not regex `\s`,
    * whose membership differs between Java (vertical tab) and RE2.
    */
  def normalizeText(text: UTF8String): UTF8String = {
    val s = text.toString
    val sb = new java.lang.StringBuilder(s.length)
    var i = 0
    val n = s.length
    var pendingSpace = false
    while (i < n) {
      val c = s.charAt(i)
      if (c == ' ' || c == '\t' || c == '\n' || c == '\r') {
        if (sb.length > 0) pendingSpace = true
      } else {
        if (pendingSpace) { sb.append(' '); pendingSpace = false }
        sb.append(c)
      }
      i += 1
    }
    UTF8String.fromString(
      java.text.Normalizer.normalize(sb, java.text.Normalizer.Form.NFC)
    )
  }

  private val BpePattern = java.util.regex.Pattern.compile("[a-z]+|[A-Z]+|[0-9]+|[^a-zA-Z0-9 ]")
  private val PunctPattern = java.util.regex.Pattern.compile("[.,!?;:]")

  private def countMatches(p: java.util.regex.Pattern, s: String): Long = {
    val m = p.matcher(s)
    var n = 0L
    while (m.find()) n += 1
    n
  }

  /** One-pass text statistics kernel: token counts, subword/punct regex
    * counts, per-language stopword hits, codepoint length, CJK presence.
    * Replaces five independent interpreted passes (split + HOF filter per
    * stopword list + two regexp_extract_all materializing match arrays)
    * with a single scan per document. Semantics are IDENTICAL to the
    * composable forms in TextFunctions — same split(-1) tokenizer, same
    * Java regexes, same codepoint length — so the DuckDB oracles are
    * untouched.
    */
  def textStats(text: UTF8String): InternalRow = {
    val str = text.toString
    val toks = str.split(" ", -1)
    val distinct = new java.util.HashSet[String]()
    var hitsEn = 0L; var hitsDe = 0L; var hitsFr = 0L; var hitsEs = 0L
    var i = 0
    while (i < toks.length) {
      val t = toks(i)
      distinct.add(t)
      if (TextFunctions.StopEnSet.contains(t)) hitsEn += 1
      if (TextFunctions.StopDeSet.contains(t)) hitsDe += 1
      if (TextFunctions.StopFrSet.contains(t)) hitsFr += 1
      if (TextFunctions.StopEsSet.contains(t)) hitsEs += 1
      i += 1
    }
    var hasCjk = false
    var ci = 0
    val n = str.length
    while (ci < n && !hasCjk) {
      val cp = str.codePointAt(ci)
      if (cp >= 0x4e00 && cp <= 0x9fff) hasCjk = true
      ci += Character.charCount(cp)
    }
    new GenericInternalRow(
      Array[Any](
        toks.length.toLong,
        distinct.size.toLong,
        countMatches(BpePattern, str),
        countMatches(PunctPattern, str),
        hitsEn,
        hitsDe,
        hitsFr,
        hitsEs,
        text.numChars().toLong,
        hasCjk
      )
    )
  }

  /** The q22 quality formula fused to ONE kernel call:
    * `round(0.5·lenScore + 0.3·stopScore + 0.2·punctScore, 6)` over the
    * [[textStats]] counters, computing only the counters the formula
    * reads (no distinct-token set, no BPE regex, no CJK scan).
    *
    * Exists because `FilterExec` generates its predicate WITHOUT
    * subexpression elimination: the getField composition over [[TextStats]]
    * evaluates the stats kernel once per referenced field — five times per
    * row — when used as a filter predicate, measured 50–175× slower than
    * the identical projected shape at 200k docs (`Profile micro`). A
    * single expression evaluates once in ANY operator.
    *
    * Bit-exactness contract: same tokenizer (`split(" ", -1)`), same
    * punct regex, same double arithmetic order as the Column composition
    * in `TextFunctions.qualityScore`, and the final rounding replicates
    * Spark's `Round` on DoubleType (`BigDecimal.valueOf` — decimal-string
    * semantics — then `setScale(6, HALF_UP)`), so q22/q42/q59/q65 oracles
    * are unchanged.
    */
  def qualityScore(text: UTF8String): Double = {
    val str = text.toString
    val toks = str.split(" ", -1)
    var hitsEn = 0L
    var i = 0
    while (i < toks.length) {
      if (TextFunctions.StopEnSet.contains(toks(i))) hitsEn += 1
      i += 1
    }
    val nTok = toks.length.toLong
    val nPunct = countMatches(PunctPattern, str)
    val nChars = text.numChars().toLong
    val stopRatio = hitsEn.toDouble / math.max(nTok, 1L).toDouble
    val lenScore = math.min(1.0, nTok.toDouble / 100.0)
    val stopScore = math.min(1.0, stopRatio * 5.0)
    val punctRatio = nPunct.toDouble / math.max(nChars, 1L).toDouble
    val punctScore = 1.0 - math.min(1.0, punctRatio * 10.0)
    val raw = 0.5 * lenScore + 0.3 * stopScore + 0.2 * punctScore
    java.math.BigDecimal
      .valueOf(raw)
      .setScale(6, java.math.RoundingMode.HALF_UP)
      .doubleValue()
  }

  /** One-pass Gopher-rule statistics (Rae et al. 2021, appendix A1.1 —
    * the structural document gates): `(n_words, mean_len_milli,
    * alpha_permille, stop_distinct)`, all BIGINT, from a single token
    * scan. Exists for the same reason as [[qualityScore]]: FilterExec
    * generates predicates without subexpression elimination, so a
    * four-metric Column composition re-splits the text once per metric
    * in the admission filter — this kernel splits once.
    *
    *  - `n_words`        — space-token count (the engine token contract);
    *  - `mean_len_milli` — mean word length in integer thousandths,
    *    chars derived as `numChars − (n_words − 1)` separators;
    *  - `alpha_permille` — integer permille of words containing at least
    *    one ASCII letter;
    *  - `stop_distinct`  — DISTINCT members of
    *    [[TextFunctions.StopwordsEn]] present as exact tokens (the
    *    paper's "at least 2 distinct stop words" form — total-occurrence
    *    counting would pass "the the").
    *
    * All-integer arithmetic (`x·1000 div n`, non-negative, so truncating
    * and floor division agree) — the DuckDB oracle mirrors each formula
    * with zero rounding risk.
    */
  def gopherStats(text: UTF8String): InternalRow = {
    val str = text.toString
    val toks = str.split(" ", -1)
    val nWords = toks.length.toLong
    var nAlpha = 0L
    var stopMask = 0
    var i = 0
    while (i < toks.length) {
      val t = toks(i)
      var j = 0
      var alpha = false
      val tn = t.length
      while (j < tn && !alpha) {
        val c = t.charAt(j)
        if ((c >= 'A' && c <= 'Z') || (c >= 'a' && c <= 'z')) alpha = true
        j += 1
      }
      if (alpha) nAlpha += 1
      val ix = TextFunctions.StopEnIndex.get(t)
      if (ix != null) stopMask |= 1 << ix.intValue()
      i += 1
    }
    val denom = math.max(nWords, 1L)
    val nCharsW = text.numChars().toLong - (nWords - 1L)
    new GenericInternalRow(
      Array[Any](
        nWords,
        nCharsW * 1000L / denom,
        nAlpha * 1000L / denom,
        java.lang.Integer.bitCount(stopMask).toLong
      )
    )
  }

  /** The Gopher keep-predicate fused to ONE boolean kernel call — the
    * admission-filter form of [[gopherStats]] (one text scan per row in
    * FilterExec, where the struct+getField composition would run the
    * kernel once per referenced field).
    */
  def gopherKeep(
      text: UTF8String,
      minWords: Long,
      maxWords: Long,
      minMeanLenMilli: Long,
      maxMeanLenMilli: Long,
      minAlphaPermille: Long,
      minStopDistinct: Long
  ): Boolean = {
    val s = gopherStats(text)
    val nWords = s.getLong(0)
    val mlm = s.getLong(1)
    nWords >= minWords && nWords <= maxWords &&
    mlm >= minMeanLenMilli && mlm <= maxMeanLenMilli &&
    s.getLong(2) >= minAlphaPermille && s.getLong(3) >= minStopDistinct
  }

  /** Exact Jaccard of two distinct-element long arrays via hash-set
    * intersection — O(|A|+|B|) against the interpreted HOF form's
    * O(|A|·|B|) contains-scan per pair (the verification hot path of every
    * near-dup query). The final arithmetic keeps the exact evaluation
    * order of the composable form (|A∩B| / (|A|+|B| − |A∩B|), all doubles)
    * so results stay bit-identical to the DuckDB oracle.
    */
  def jaccard(a: ArrayData, b: ArrayData): Double = {
    val na = a.numElements()
    val nb = b.numElements()
    val set = new java.util.HashSet[java.lang.Long](nb * 2)
    var i = 0
    while (i < nb) { set.add(b.getLong(i)); i += 1 }
    var inter = 0
    i = 0
    while (i < na) {
      if (set.contains(a.getLong(i))) inter += 1
      i += 1
    }
    inter.toDouble / (na.toDouble + nb.toDouble - inter.toDouble)
  }

  /** Deterministic pseudo-random hyperplane weight for global plane index
    * `plane`, vector component `j`. The mix must be NONLINEAR (xor-shift
    * between the multiplicative rounds): a pure linear-congruential chain on
    * the sequential index (plane*dim + j) is a lattice — consecutive planes
    * come out heavily correlated and LSH recall collapses (measured: 0.3 vs
    * 0.9 after the fix). Every intermediate stays below 2^63 and uses only
    * *, %, xor, >> — so DuckDB BIGINT arithmetic (which traps on overflow)
    * reproduces it bit-for-bit.
    */
  def planeWeight(plane: Int, j: Int, dim: Int): Double = {
    val idx = plane.toLong * dim + j
    var h = (idx * 2654435761L) % 2147483648L
    h = h ^ (h >> 15)
    h = (h * 48271L) % 2147483648L
    h = h ^ (h >> 13)
    (h % 1000003L).toDouble / 1000003.0 - 0.5
  }

  private val planeCache =
    new java.util.concurrent.ConcurrentHashMap[(Int, Int), Array[Double]]()

  /** All `numPlanes` hyperplanes for `dim`, flattened [plane*dim + j],
    * built once per JVM and shared across rows/tasks.
    */
  def planes(numPlanes: Int, dim: Int): Array[Double] =
    planeCache.computeIfAbsent(
      (numPlanes, dim),
      _ => {
        val w = new Array[Double](numPlanes * dim)
        var p = 0
        while (p < numPlanes) {
          var j = 0
          while (j < dim) {
            w(p * dim + j) = planeWeight(p, j, dim)
            j += 1
          }
          p += 1
        }
        w
      }
    )

  /** Multi-table LSH signature: `tables` longs, table t packing the sign
    * bits of planes [t*w, (t+1)*w) (bit j = plane t*w+j). The dot product
    * accumulates double in component order — the same fold the DuckDB
    * oracle performs — so the sign decision is bit-identical.
    */
  def lshBuckets(vec: ArrayData, tables: Int, w: Int, dim: Int): ArrayData = {
    val pw = planes(tables * w, dim)
    // a silently truncated/zero-padded dot product would bucket this
    // engine differently from the HOF mirror and the DuckDB oracle —
    // reject mis-dimensioned vectors instead
    require(
      vec.numElements() == dim,
      s"lsh_buckets: vector has ${vec.numElements()} components, expected dim=$dim"
    )
    val n = dim
    val out = new Array[Long](tables)
    var t = 0
    while (t < tables) {
      var bucket = 0L
      var j = 0
      while (j < w) {
        val base = (t * w + j) * dim
        var dot = 0.0
        var c = 0
        while (c < n) {
          dot += vec.getFloat(c).toDouble * pw(base + c)
          c += 1
        }
        if (dot >= 0.0) bucket |= (1L << j)
        j += 1
      }
      out(t) = bucket
      t += 1
    }
    new GenericArrayData(out)
  }

  /** Cosine similarity over float vectors, accumulated in double in index
    * order — the exact fold the DuckDB oracle performs with `list_reduce`,
    * so results compare bit-for-bit.
    */
  def cosine(a: ArrayData, b: ArrayData): Double = {
    val n = math.min(a.numElements(), b.numElements())
    var dot = 0.0
    var na = 0.0
    var nb = 0.0
    var i = 0
    while (i < n) {
      val x = a.getFloat(i).toDouble
      val y = b.getFloat(i).toDouble
      dot += x * y
      na += x * x
      nb += y * y
      i += 1
    }
    dot / (math.sqrt(na) * math.sqrt(nb))
  }

  /** Feature-hashing text embedder (the "hashing trick"): token t lands in
    * lane polyHash(t) % dim with sign from the next hash bit-range
    * ((h div dim) mod 2), lanes accumulate as exact integers and convert to
    * float once at the end. Deterministic, vocabulary-free, one pass —
    * gives every text document an `array<float>` embedding that the whole
    * similarity stack (cosine kernel, top-k aggregate, LSH) consumes
    * directly, and every step is integer arithmetic the DuckDB oracle
    * replays bit-for-bit (signs and sums exact; Long→Float conversion is
    * exact below 2^24).
    */
  def featureHash(text: UTF8String, dim: Int): ArrayData = {
    val toks = text.toString.split(" ", -1)
    val acc = new Array[Long](dim)
    var i = 0
    while (i < toks.length) {
      val h = polyHash(toks(i))
      val lane = (h % dim).toInt
      acc(lane) += (if ((h / dim) % 2L == 0L) 1L else -1L)
      i += 1
    }
    val out = new Array[Float](dim)
    var j = 0
    while (j < dim) { out(j) = acc(j).toFloat; j += 1 }
    new GenericArrayData(out)
  }

  /** Remix of a polyHash value into 32 UNIFORM bits. polyHash lives in
    * [0, 1e9+7) — below 2^30 — so its bits 30-31 are constant-zero and
    * 28-29 heavily biased. A SimHash voting on those bits directly gives
    * every document the same top bits, which collapses the top pigeonhole
    * band into ONE bucket: measured on a 200k-doc corpus, the band-2
    * bucket held all 197k docs → 19.4 BILLION candidate pairs (the 2048
    * buckets the band's 10 bits promise would give ~24M). Two
    * multiplicative rounds with xor-shifts spread the 30 bits of entropy
    * across all 32 positions; every intermediate stays below 2^63 using
    * only *, %, xor, >> — DuckDB replays it exactly.
    */
  def remix32(h0: Long): Long = {
    var h = (h0 * 2654435761L) % 4294967296L
    h = h ^ (h >> 16)
    h = (h * 48271L) % 4294967296L
    h ^ (h >> 13)
  }

  /** One-pass 32-bit SimHash. SimHash is a PURE function of the document's
    * own tokens — the round-2 explode + groupBy formulation shuffled one
    * row per token for an embarrassingly-parallel computation; this kernel
    * removes that shuffle entirely (q27/q39 become scan-only, and the
    * simhash feeding q29's banding is free). Bit i is set when the
    * (weight-)vote for bit i wins: Σ w·bit_i(remix32(polyHash(tok))) · 2 ≥
    * Σ w, with w = 1 (unweighted) or w = codepoint length of the token
    * (weighted) — exactly the aggregate formula the DuckDB oracles mirror.
    * The [[remix32]] stage is what makes all 32 fingerprint bits carry
    * signal (see its scaladoc for the measured failure without it).
    */
  def simhash32(text: UTF8String, weighted: Boolean): Long = {
    val toks = text.toString.split(" ", -1)
    val sums = new Array[Long](32)
    var wsum = 0L
    var i = 0
    while (i < toks.length) {
      val t = toks(i)
      val h = remix32(polyHash(t))
      val w = if (weighted) t.codePointCount(0, t.length).toLong else 1L
      wsum += w
      var b = 0
      while (b < 32) {
        if (((h >> b) & 1L) == 1L) sums(b) += w
        b += 1
      }
      i += 1
    }
    var out = 0L
    var b = 0
    while (b < 32) {
      if (sums(b) * 2L >= wsum) out |= (1L << b)
      b += 1
    }
    out
  }

  def dot(a: ArrayData, b: ArrayData): Double = {
    val n = math.min(a.numElements(), b.numElements())
    var acc = 0.0
    var i = 0
    while (i < n) {
      acc += a.getFloat(i).toDouble * b.getFloat(i).toDouble
      i += 1
    }
    acc
  }
}

/** `poly_hash(string) -> long` — custom Catalyst expression with codegen.
  * Preferred over a Scala UDF: no serialization boundary, participates in
  * whole-stage codegen, null handling comes from UnaryExpression.
  */
case class PolyHash(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true
  override protected def nullSafeEval(input: Any): Any =
    Kernels.polyHash(input.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.Kernels.polyHash($c)")
  override protected def withNewChildInternal(newChild: Expression): PolyHash =
    copy(child = newChild)
}

/** `cosine_sim(array<float>, array<float>) -> double` — fused similarity
  * kernel. The composable alternative (`zip_with` + `aggregate` higher-order
  * functions) allocates an intermediate array per row; this expression is a
  * single pass over the two ArrayData buffers and stays codegen'd, which is
  * what you want when it sits inside a pairwise-similarity join at scale.
  */
case class CosineSimilarity(left: Expression, right: Expression)
    extends BinaryExpression with ExpectsInputTypes {
  override def dataType: DataType = DoubleType
  override def inputTypes: Seq[DataType] = Seq(ArrayType(FloatType), ArrayType(FloatType))
  override def nullIntolerant: Boolean = true
  override protected def nullSafeEval(a: Any, b: Any): Any =
    Kernels.cosine(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.functions.Kernels.cosine($a, $b)")
  override protected def withNewChildrenInternal(l: Expression, r: Expression): CosineSimilarity =
    copy(left = l, right = r)
}

case class DotProduct(left: Expression, right: Expression)
    extends BinaryExpression with ExpectsInputTypes {
  override def dataType: DataType = DoubleType
  override def inputTypes: Seq[DataType] = Seq(ArrayType(FloatType), ArrayType(FloatType))
  override def nullIntolerant: Boolean = true
  override protected def nullSafeEval(a: Any, b: Any): Any =
    Kernels.dot(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.functions.Kernels.dot($a, $b)")
  override protected def withNewChildrenInternal(l: Expression, r: Expression): DotProduct =
    copy(left = l, right = r)
}

/** `shingle_minhash(text) -> struct(sh array<string>, sig array<long>)` —
  * the fused dedup kernel (see [[Kernels.shingleMinhash]]). One generated
  * call per document replaces an interpreted nested-HOF pipeline that was
  * 70% of the round-1 bench (`VERDICT.md` "What's wrong" #2–3).
  */
case class ShingleMinHash(child: Expression, k: Int, numHashes: Int)
    extends UnaryExpression with ExpectsInputTypes {
  override def dataType: DataType = StructType(
    Seq(
      StructField("sh", ArrayType(LongType, containsNull = false), nullable = false),
      StructField("sig", ArrayType(LongType, containsNull = false), nullable = false)
    )
  )
  override def inputTypes: Seq[DataType] = Seq(StringType)
  override def nullIntolerant: Boolean = true
  override protected def nullSafeEval(input: Any): Any =
    Kernels.shingleMinhash(input.asInstanceOf[UTF8String], k, numHashes)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.Kernels.shingleMinhash($c, $k, $numHashes)")
  override protected def withNewChildInternal(newChild: Expression): ShingleMinHash =
    copy(child = newChild)
}

/** `winnow_fps(text, k, w) -> array<long>` — winnowed document
  * fingerprints (see [[Kernels.winnow]]): the substring-robust upgrade of
  * the whole-document [[PolyHash]] fingerprint, and the unit of MOSS-style
  * copy detection ([[graft.operators.Dedup.winnowedPairs]]).
  */
case class WinnowFingerprints(child: Expression, k: Int, w: Int)
    extends UnaryExpression with ExpectsInputTypes {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def inputTypes: Seq[DataType] = Seq(StringType)
  override def nullIntolerant: Boolean = true
  override protected def nullSafeEval(input: Any): Any =
    Kernels.winnow(input.asInstanceOf[UTF8String], k, w)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.Kernels.winnow($c, $k, $w)")
  override protected def withNewChildInternal(newChild: Expression): WinnowFingerprints =
    copy(child = newChild)
}

/** `lsh_buckets(vec) -> array<long>` — multi-table random-hyperplane LSH
  * signature (see [[Kernels.lshBuckets]]); plane weights come from the
  * shared deterministic xor-shift generator so the DuckDB oracle buckets
  * identically.
  */
case class LshBuckets(child: Expression, tables: Int, planesPerTable: Int, dim: Int)
    extends UnaryExpression with ExpectsInputTypes {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def inputTypes: Seq[DataType] = Seq(ArrayType(FloatType))
  override def nullIntolerant: Boolean = true
  override protected def nullSafeEval(input: Any): Any =
    Kernels.lshBuckets(input.asInstanceOf[ArrayData], tables, planesPerTable, dim)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(
      ctx,
      ev,
      c => s"graft.functions.Kernels.lshBuckets($c, $tables, $planesPerTable, $dim)"
    )
  override protected def withNewChildInternal(newChild: Expression): LshBuckets =
    copy(child = newChild)
}

/** `positional_shingles(text) -> array<string>` — positional k-token
  * windows (see [[Kernels.positionalShingles]]): the O(n·k) kernel form of
  * the window transform every sliding-window operator builds on.
  */
case class PositionalShingles(child: Expression, k: Int)
    extends UnaryExpression with ExpectsInputTypes {
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def inputTypes: Seq[DataType] = Seq(StringType)
  override def nullIntolerant: Boolean = true
  override protected def nullSafeEval(input: Any): Any =
    Kernels.positionalShingles(input.asInstanceOf[UTF8String], k)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.Kernels.positionalShingles($c, $k)")
  override protected def withNewChildInternal(newChild: Expression): PositionalShingles =
    copy(child = newChild)
}

/** `token_chunks(text) -> array<string>` — fixed-stride token tiling
  * (see [[Kernels.chunks]]).
  */
case class TokenChunks(child: Expression, chunkSize: Int, overlap: Int)
    extends UnaryExpression with ExpectsInputTypes {
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def inputTypes: Seq[DataType] = Seq(StringType)
  override def nullIntolerant: Boolean = true
  override protected def nullSafeEval(input: Any): Any =
    Kernels.chunks(input.asInstanceOf[UTF8String], chunkSize, overlap)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.Kernels.chunks($c, $chunkSize, $overlap)")
  override protected def withNewChildInternal(newChild: Expression): TokenChunks =
    copy(child = newChild)
}

/** `normalize_text(text) -> string` — NFC + whitespace canonicalization
  * (see [[Kernels.normalizeText]]).
  */
case class NormalizeText(child: Expression)
    extends UnaryExpression with ExpectsInputTypes {
  override def dataType: DataType = StringType
  override def inputTypes: Seq[DataType] = Seq(StringType)
  override def nullIntolerant: Boolean = true
  override protected def nullSafeEval(input: Any): Any =
    Kernels.normalizeText(input.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.Kernels.normalizeText($c)")
  override protected def withNewChildInternal(newChild: Expression): NormalizeText =
    copy(child = newChild)
}

/** `positional_shingle_hashes(text) -> array<long>` — positional window
  * polyHashes (see [[Kernels.positionalShingleHashes]]).
  */
case class PositionalShingleHashes(child: Expression, k: Int)
    extends UnaryExpression with ExpectsInputTypes {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def inputTypes: Seq[DataType] = Seq(StringType)
  override def nullIntolerant: Boolean = true
  override protected def nullSafeEval(input: Any): Any =
    Kernels.positionalShingleHashes(input.asInstanceOf[UTF8String], k)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.Kernels.positionalShingleHashes($c, $k)")
  override protected def withNewChildInternal(newChild: Expression): PositionalShingleHashes =
    copy(child = newChild)
}

/** `char_gram_pairs(text) -> array<struct<p:long, g:long>>` — fused
  * char-bigram-prefix/trigram pair hashes (see
  * [[Kernels.charGramPairHashes]]).
  */
case class CharGramPairs(child: Expression)
    extends UnaryExpression with ExpectsInputTypes {
  override def dataType: DataType = ArrayType(
    StructType(Seq(StructField("p", LongType, nullable = false), StructField("g", LongType, nullable = false))),
    containsNull = false
  )
  override def inputTypes: Seq[DataType] = Seq(StringType)
  override def nullIntolerant: Boolean = true
  override protected def nullSafeEval(input: Any): Any =
    Kernels.charGramPairHashes(input.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.Kernels.charGramPairHashes($c)")
  override protected def withNewChildInternal(newChild: Expression): CharGramPairs =
    copy(child = newChild)
}

/** `char_gram_hashes(text, n) -> array<long>` — positional char-n-gram
  * polyHashes (see [[Kernels.charGramHashes]]).
  */
case class CharGramHashes(child: Expression, n: Int)
    extends UnaryExpression with ExpectsInputTypes {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def inputTypes: Seq[DataType] = Seq(StringType)
  override def nullIntolerant: Boolean = true
  override protected def nullSafeEval(input: Any): Any =
    Kernels.charGramHashes(input.asInstanceOf[UTF8String], n)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.Kernels.charGramHashes($c, $n)")
  override protected def withNewChildInternal(newChild: Expression): CharGramHashes =
    copy(child = newChild)
}

/** `simhash32(text) -> long` — one-pass SimHash fingerprint (see
  * [[Kernels.simhash32]]).
  */
case class SimHash32(child: Expression, weighted: Boolean)
    extends UnaryExpression with ExpectsInputTypes {
  override def dataType: DataType = LongType
  override def inputTypes: Seq[DataType] = Seq(StringType)
  override def nullIntolerant: Boolean = true
  override protected def nullSafeEval(input: Any): Any =
    Kernels.simhash32(input.asInstanceOf[UTF8String], weighted)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.Kernels.simhash32($c, $weighted)")
  override protected def withNewChildInternal(newChild: Expression): SimHash32 =
    copy(child = newChild)
}

/** `feature_hash(text) -> array<float>` — hashing-trick text embedding
  * (see [[Kernels.featureHash]]).
  */
case class FeatureHash(child: Expression, dim: Int)
    extends UnaryExpression with ExpectsInputTypes {
  override def dataType: DataType = ArrayType(FloatType, containsNull = false)
  override def inputTypes: Seq[DataType] = Seq(StringType)
  override def nullIntolerant: Boolean = true
  override protected def nullSafeEval(input: Any): Any =
    Kernels.featureHash(input.asInstanceOf[UTF8String], dim)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.Kernels.featureHash($c, $dim)")
  override protected def withNewChildInternal(newChild: Expression): FeatureHash =
    copy(child = newChild)
}

/** `jaccard_sim(array<long>, array<long>) -> double` — exact Jaccard
  * over distinct-element hash arrays (see [[Kernels.jaccard]]).
  */
case class JaccardSim(left: Expression, right: Expression)
    extends BinaryExpression with ExpectsInputTypes {
  override def dataType: DataType = DoubleType
  override def inputTypes: Seq[DataType] = Seq(ArrayType(LongType), ArrayType(LongType))
  override def nullIntolerant: Boolean = true
  override protected def nullSafeEval(a: Any, b: Any): Any =
    Kernels.jaccard(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.functions.Kernels.jaccard($a, $b)")
  override protected def withNewChildrenInternal(l: Expression, r: Expression): JaccardSim =
    copy(left = l, right = r)
}

/** `text_stats(text) -> struct(...)` — the fused one-pass text-statistics
  * kernel (see [[Kernels.textStats]]).
  */
case class TextStats(child: Expression) extends UnaryExpression with ExpectsInputTypes {
  override def dataType: DataType = TextStats.schema
  override def inputTypes: Seq[DataType] = Seq(StringType)
  override def nullIntolerant: Boolean = true
  override protected def nullSafeEval(input: Any): Any =
    Kernels.textStats(input.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.Kernels.textStats($c)")
  override protected def withNewChildInternal(newChild: Expression): TextStats =
    copy(child = newChild)
}

/** `quality_score(text) -> double` — the q22 quality formula as ONE
  * scalar expression (see [[Kernels.qualityScore]] for why: FilterExec
  * re-evaluates multi-getField struct compositions per field).
  */
case class QualityScore(child: Expression) extends UnaryExpression with ExpectsInputTypes {
  override def dataType: DataType = DoubleType
  override def inputTypes: Seq[DataType] = Seq(StringType)
  override def nullIntolerant: Boolean = true
  override protected def nullSafeEval(input: Any): Any =
    Kernels.qualityScore(input.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.Kernels.qualityScore($c)")
  override protected def withNewChildInternal(newChild: Expression): QualityScore =
    copy(child = newChild)
}

/** `gopher_stats(text) -> struct(n_words, mean_len_milli, alpha_permille,
  * stop_distinct)` — the fused one-pass Gopher rule metrics (see
  * [[Kernels.gopherStats]]).
  */
case class GopherStats(child: Expression) extends UnaryExpression with ExpectsInputTypes {
  override def dataType: DataType = GopherStats.schema
  override def inputTypes: Seq[DataType] = Seq(StringType)
  override def nullIntolerant: Boolean = true
  override protected def nullSafeEval(input: Any): Any =
    Kernels.gopherStats(input.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.Kernels.gopherStats($c)")
  override protected def withNewChildInternal(newChild: Expression): GopherStats =
    copy(child = newChild)
}

object GopherStats {
  val schema: StructType = StructType(
    Seq(
      StructField("n_words", LongType, nullable = false),
      StructField("mean_len_milli", LongType, nullable = false),
      StructField("alpha_permille", LongType, nullable = false),
      StructField("stop_distinct", LongType, nullable = false)
    )
  )
}

/** `gopher_keep(text) -> boolean` — the Gopher admission predicate as ONE
  * scalar expression (see [[Kernels.gopherKeep]] for why filters need the
  * fused form).
  */
case class GopherKeep(
    child: Expression,
    minWords: Long,
    maxWords: Long,
    minMeanLenMilli: Long,
    maxMeanLenMilli: Long,
    minAlphaPermille: Long,
    minStopDistinct: Long
) extends UnaryExpression with ExpectsInputTypes {
  override def dataType: DataType = org.apache.spark.sql.types.BooleanType
  override def inputTypes: Seq[DataType] = Seq(StringType)
  override def nullIntolerant: Boolean = true
  override protected def nullSafeEval(input: Any): Any =
    Kernels.gopherKeep(
      input.asInstanceOf[UTF8String],
      minWords, maxWords, minMeanLenMilli, maxMeanLenMilli,
      minAlphaPermille, minStopDistinct
    )
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(
      ctx,
      ev,
      c =>
        s"graft.functions.Kernels.gopherKeep($c, ${minWords}L, ${maxWords}L, " +
          s"${minMeanLenMilli}L, ${maxMeanLenMilli}L, ${minAlphaPermille}L, ${minStopDistinct}L)"
    )
  override protected def withNewChildInternal(newChild: Expression): GopherKeep =
    copy(child = newChild)
}

object TextStats {
  val schema: StructType = StructType(
    Seq(
      StructField("n_tokens", LongType, nullable = false),
      StructField("n_distinct_tokens", LongType, nullable = false),
      StructField("n_bpe", LongType, nullable = false),
      StructField("n_punct", LongType, nullable = false),
      StructField("hits_en", LongType, nullable = false),
      StructField("hits_de", LongType, nullable = false),
      StructField("hits_fr", LongType, nullable = false),
      StructField("hits_es", LongType, nullable = false),
      StructField("n_chars", LongType, nullable = false),
      StructField("has_cjk", org.apache.spark.sql.types.BooleanType, nullable = false)
    )
  )
}

/** Column-level entry points for the custom expressions. */
object GraftExpressions {
  def poly_hash(c: Column): Column =
    GraftBridge.column(PolyHash(GraftBridge.expression(c)))

  /** Column form of [[Kernels.remix32]] (same constants, builtin
    * arithmetic only, so it stays codegen'd and DuckDB-mirrorable via
    * `OracleFragments.remix32`). Required whenever a polyHash value is
    * used for ORDERING or bit-level placement rather than equality:
    * polyHash of a SHORT string (≲6 chars, e.g. `"id:seed"` for small
    * ids) never wraps the 1e9+7 modulus, so it is MONOTONE in the
    * string — and appending a seed as a suffix shifts every same-length
    * hash by the same constant, which preserves the order entirely. The
    * avalanche rounds break both properties.
    */
  def remix32(h: Column): Column = {
    val h1 = (h * lit(2654435761L)) % lit(4294967296L)
    val h2 = h1.bitwiseXOR(shiftright(h1, 16))
    val h3 = (h2 * lit(48271L)) % lit(4294967296L)
    h3.bitwiseXOR(shiftright(h3, 13))
  }
  def cosine_sim(a: Column, b: Column): Column =
    GraftBridge.column(
      CosineSimilarity(GraftBridge.expression(a), GraftBridge.expression(b))
    )
  def dot_product(a: Column, b: Column): Column =
    GraftBridge.column(
      DotProduct(GraftBridge.expression(a), GraftBridge.expression(b))
    )
  def shingle_minhash(text: Column, k: Int, numHashes: Int): Column =
    GraftBridge.column(ShingleMinHash(GraftBridge.expression(text), k, numHashes))
  def lsh_buckets(vec: Column, tables: Int, planesPerTable: Int, dim: Int): Column =
    GraftBridge.column(
      LshBuckets(GraftBridge.expression(vec), tables, planesPerTable, dim)
    )
  def top_k_neighbors(score: Column, id: Column, k: Int): Column =
    GraftBridge.column(
      TopKNeighbors(GraftBridge.expression(score), GraftBridge.expression(id), k)
        .toAggregateExpression()
    )
  def misra_gries(item: Column, capacity: Int): Column =
    GraftBridge.column(
      MisraGries(GraftBridge.expression(item), capacity).toAggregateExpression()
    )
  def text_stats(text: Column): Column =
    GraftBridge.column(TextStats(GraftBridge.expression(text)))
  def quality_score(text: Column): Column =
    GraftBridge.column(QualityScore(GraftBridge.expression(text)))
  def jaccard_sim(a: Column, b: Column): Column =
    GraftBridge.column(JaccardSim(GraftBridge.expression(a), GraftBridge.expression(b)))
  def feature_hash(text: Column, dim: Int): Column =
    GraftBridge.column(FeatureHash(GraftBridge.expression(text), dim))
  def simhash32(text: Column, weighted: Boolean = false): Column =
    GraftBridge.column(SimHash32(GraftBridge.expression(text), weighted))
  def winnow_fps(text: Column, k: Int, w: Int): Column =
    GraftBridge.column(WinnowFingerprints(GraftBridge.expression(text), k, w))
  def positional_shingles(text: Column, k: Int): Column =
    GraftBridge.column(PositionalShingles(GraftBridge.expression(text), k))
  def char_gram_pairs(text: Column): Column =
    GraftBridge.column(CharGramPairs(GraftBridge.expression(text)))
  def char_gram_hashes(text: Column, n: Int): Column =
    GraftBridge.column(CharGramHashes(GraftBridge.expression(text), n))
  def positional_shingle_hashes(text: Column, k: Int): Column =
    GraftBridge.column(PositionalShingleHashes(GraftBridge.expression(text), k))
  def token_chunks(text: Column, chunkSize: Int, overlap: Int): Column =
    GraftBridge.column(TokenChunks(GraftBridge.expression(text), chunkSize, overlap))
  def normalize_text(text: Column): Column =
    GraftBridge.column(NormalizeText(GraftBridge.expression(text)))
  def gopher_stats(text: Column): Column =
    GraftBridge.column(GopherStats(GraftBridge.expression(text)))
  def gopher_keep(
      text: Column,
      minWords: Long,
      maxWords: Long,
      minMeanLenMilli: Long,
      maxMeanLenMilli: Long,
      minAlphaPermille: Long,
      minStopDistinct: Long
  ): Column =
    GraftBridge.column(
      GopherKeep(
        GraftBridge.expression(text),
        minWords, maxWords, minMeanLenMilli, maxMeanLenMilli,
        minAlphaPermille, minStopDistinct
      )
    )
}
