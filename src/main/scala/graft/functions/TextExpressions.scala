package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, UnsafeArrayData, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.Platform
import org.apache.spark.unsafe.types.UTF8String

/** Single-pass text-dedup kernels.
  *
  * Each kernel fuses tokenize -> hash -> reduce for ONE document into a
  * tight byte-level loop over the UTF-8 payload, replacing plan shapes
  * that were per-token: `transform(split(...), xxhash64)` evaluates an
  * interpreted lambda per token (HOFs don't codegen), and the
  * MinHash/SimHash signature aggregations exploded every token/shingle
  * through a hash-partitioned shuffle just to min/sum them back per
  * document. With the kernels, signature computation is a MAP-ONLY
  * projection — no explode, no shuffle, nothing crosses the wire but
  * (doc_id, signature). That is the shape that matters at 100 TB: the
  * dedup signature stage becomes embarrassingly parallel and its
  * network cost drops from O(tokens) to O(documents).
  *
  * Numeric compatibility invariants (pinned by ScalaTest):
  *   - tokens = Java regex `\s+` split semantics = maximal runs of
  *     non-[\t\n\x0B\f\r ] bytes (ASCII ws never occurs inside a UTF-8
  *     multibyte sequence, so byte scanning is exact);
  *   - token/shingle hash = Spark `xxhash64` (XXH64, seed 42) over the
  *     exact UTF-8 bytes; shingles are 3 tokens joined by 0x20;
  *   - the MinHash permutation arithmetic reproduces
  *     `pmod(h, p)` / `(h*a + b) % p` on nonnegative operands.
  */
object TextKernels {

  /** Spark's default xxhash64 seed (`XxHash64` expression). */
  final val HashSeed = 42L

  /** Java-regex `\s`: [ \t\n\x0B\f\r]. */
  @inline private def isWs(b: Byte): Boolean =
    b == 0x20 || (b >= 0x09 && b <= 0x0d)

  /** Find token spans; returns packed (start, end) offset pairs. */
  private def tokenSpans(base: AnyRef, off: Long, n: Int): (Array[Int], Int) = {
    var spans = new Array[Int](16)
    var cnt = 0
    var i = 0
    while (i < n) {
      while (i < n && isWs(Platform.getByte(base, off + i))) i += 1
      val st = i
      while (i < n && !isWs(Platform.getByte(base, off + i))) i += 1
      if (i > st) {
        if (2 * cnt == spans.length) spans = java.util.Arrays.copyOf(spans, spans.length * 2)
        spans(2 * cnt) = st
        spans(2 * cnt + 1) = i
        cnt += 1
      }
    }
    (spans, cnt)
  }

  /** sort_array(array_distinct(transform(wsTokens(text), xxhash64))) in
    * one pass: the per-document input of the Jaccard pair kernel
    * ([[SortedIntersectCount]]).
    */
  def hashedSortedTokens(s: UTF8String): ArrayData = {
    val base = s.getBaseObject
    val off = s.getBaseOffset
    val (spans, cnt) = tokenSpans(base, off, s.numBytes)
    val hs = new Array[Long](cnt)
    var t = 0
    while (t < cnt) {
      hs(t) = XXH64.hashUnsafeBytes(
        base, off + spans(2 * t), spans(2 * t + 1) - spans(2 * t), HashSeed)
      t += 1
    }
    java.util.Arrays.sort(hs)
    var w = 0
    var r = 0
    while (r < cnt) {
      if (w == 0 || hs(w - 1) != hs(r)) { hs(w) = hs(r); w += 1 }
      r += 1
    }
    UnsafeArrayData.fromPrimitiveArray(java.util.Arrays.copyOf(hs, w))
  }

  /** 64-bit SimHash: per ws-token occurrence, bit b of xxhash64(token)
    * votes +1/-1; fingerprint bit b is set iff the vote sum is > 0.
    */
  def simhash64(s: UTF8String): Long = {
    val base = s.getBaseObject
    val off = s.getBaseOffset
    val (spans, cnt) = tokenSpans(base, off, s.numBytes)
    val votes = new Array[Int](64)
    var t = 0
    while (t < cnt) {
      val h = XXH64.hashUnsafeBytes(
        base, off + spans(2 * t), spans(2 * t + 1) - spans(2 * t), HashSeed)
      var b = 0
      while (b < 64) {
        if (((h >>> b) & 1L) == 1L) votes(b) += 1 else votes(b) -= 1
        b += 1
      }
      t += 1
    }
    var sig = 0L
    var b = 0
    while (b < 64) {
      if (votes(b) > 0) sig |= (1L << b)
      b += 1
    }
    sig
  }

  /** MinHash signature over 3-token shingles (tokens joined by a single
    * 0x20, exactly `concat_ws(" ", ...)`); documents with fewer than 3
    * tokens contribute one shingle = all tokens joined (the empty
    * string for an all-whitespace document). Per shingle:
    * h = pmod(xxhash64(shingle), prime); component k is the min of
    * (h * a(k) + b(k)) % prime — all operands nonnegative and
    * < 2^31, so the product stays far from overflow.
    */
  def minhashSignature(
      s: UTF8String, a: Array[Long], b: Array[Long], prime: Long): ArrayData = {
    val base = s.getBaseObject
    val off = s.getBaseOffset
    val (spans, cnt) = tokenSpans(base, off, s.numBytes)
    val k = a.length
    val sig = new Array[Long](k)
    java.util.Arrays.fill(sig, Long.MaxValue)

    var buf = new Array[Byte](64)
    def shingleHash(from: Int, until: Int): Long = {
      // join token spans [from, until) with single spaces into buf
      var len = 0
      var t = from
      while (t < until) {
        val tl = spans(2 * t + 1) - spans(2 * t)
        if (len + tl + 1 > buf.length)
          buf = java.util.Arrays.copyOf(buf, math.max(buf.length * 2, len + tl + 1))
        if (t > from) { buf(len) = 0x20; len += 1 }
        Platform.copyMemory(base, off + spans(2 * t), buf,
          Platform.BYTE_ARRAY_OFFSET + len, tl.toLong)
        len += tl
        t += 1
      }
      XXH64.hashUnsafeBytes(buf, Platform.BYTE_ARRAY_OFFSET, len, HashSeed)
    }

    def fold(h0: Long): Unit = {
      val h = ((h0 % prime) + prime) % prime
      var j = 0
      while (j < k) {
        val v = (h * a(j) + b(j)) % prime
        if (v < sig(j)) sig(j) = v
        j += 1
      }
    }

    if (cnt >= 3) {
      var i = 0
      while (i <= cnt - 3) { fold(shingleHash(i, i + 3)); i += 1 }
    } else {
      fold(shingleHash(0, cnt))
    }
    UnsafeArrayData.fromPrimitiveArray(sig)
  }

  /** MessageDigest is not thread-safe; one per executor thread. */
  private val md5Local = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  /** First 4 md5 digest bytes of buf[0, len) as the unsigned big-endian
    * 32-bit value — bit-identical to the SQL spelling
    * `conv(substring(md5(x), 1, 8), 16, 10)` (8 hex chars = 4 bytes)
    * without materializing the 32-char hex string or parsing it back.
    */
  @inline private def md5Prefix32(buf: Array[Byte], len: Int): Long = {
    val md = md5Local.get()
    md.reset()
    md.update(buf, 0, len)
    val d = md.digest()
    ((d(0) & 0xffL) << 24) | ((d(1) & 0xffL) << 16) |
      ((d(2) & 0xffL) << 8) | (d(3) & 0xffL)
  }

  /** First 15 md5 hex chars (= first 60 digest bits) of buf[0, len) as
    * a nonnegative long — bit-identical to
    * `conv(substring(md5(x), 1, 15), 16, 10)`: the big-endian value of
    * the first 8 bytes shifted right 4 (15 hex chars drop the low
    * nibble of byte 7).
    */
  @inline private def md5Prefix60(buf: Array[Byte], len: Int): Long = {
    val md = md5Local.get()
    md.reset()
    md.update(buf, 0, len)
    val d = md.digest()
    var v = 0L
    var i = 0
    while (i < 8) { v = (v << 8) | (d(i) & 0xffL); i += 1 }
    v >>> 4
  }

  /** [[minhashSignature]] with the md5-prefix base hash — the fused
    * kernel behind the DRIVER minhash query ([[graft.llm.Dedup
    * .minhashPairsExact]]), where the shingle hash must replay in ANSI
    * SQL (md5 is the one hash both engines evaluate identically).
    * Equality with the composed-expression spelling (wsTokens ->
    * concat_ws shingles -> md5/conv/pmod -> HOF min) is asserted in
    * FunctionsSpec; the win over that spelling is allocation, not
    * semantics — no shingle UTF8Strings, no hex strings, no conv
    * parse, ~4x on the signature stage at sf0.1.
    */
  def minhashSignatureMd5(
      s: UTF8String, a: Array[Long], b: Array[Long], prime: Long): ArrayData = {
    val base = s.getBaseObject
    val off = s.getBaseOffset
    val (spans, cnt) = tokenSpans(base, off, s.numBytes)
    val k = a.length
    val sig = new Array[Long](k)
    java.util.Arrays.fill(sig, Long.MaxValue)

    var buf = new Array[Byte](64)
    def shingleHash(from: Int, until: Int): Long = {
      var len = 0
      var t = from
      while (t < until) {
        val tl = spans(2 * t + 1) - spans(2 * t)
        if (len + tl + 1 > buf.length)
          buf = java.util.Arrays.copyOf(buf, math.max(buf.length * 2, len + tl + 1))
        if (t > from) { buf(len) = 0x20; len += 1 }
        Platform.copyMemory(base, off + spans(2 * t), buf,
          Platform.BYTE_ARRAY_OFFSET + len, tl.toLong)
        len += tl
        t += 1
      }
      md5Prefix32(buf, len)
    }

    def fold(h0: Long): Unit = {
      val h = h0 % prime // h0 is an unsigned 32-bit value: already >= 0
      var j = 0
      while (j < k) {
        val v = (h * a(j) + b(j)) % prime
        if (v < sig(j)) sig(j) = v
        j += 1
      }
    }

    if (cnt >= 3) {
      var i = 0
      while (i <= cnt - 3) { fold(shingleHash(i, i + 3)); i += 1 }
    } else {
      fold(shingleHash(0, cnt))
    }
    UnsafeArrayData.fromPrimitiveArray(sig)
  }

  /** md5-prefix-60 hash of every k-token gram (tokens joined by 0x20,
    * the shared shingle convention; a doc with fewer than k tokens
    * contributes its whole token string as one gram) — the fused
    * kernel behind [[graft.llm.TextOps.winnowSets]]. Bit-identical to
    * the composed spelling
    * `transform(sequence(...), i -> conv(substring(md5(concat_ws(' ',
    * slice(toks, i, k))), 1, 15), 16, 10))` without materializing
    * gram strings or hex; one digest per gram.
    */
  def winnowGramHashes(s: UTF8String, k: Int): ArrayData = {
    val base = s.getBaseObject
    val off = s.getBaseOffset
    val (spans, cnt) = tokenSpans(base, off, s.numBytes)
    var buf = new Array[Byte](64)
    def gramHash(from: Int, until: Int): Long = {
      var len = 0
      var t = from
      while (t < until) {
        val tl = spans(2 * t + 1) - spans(2 * t)
        if (len + tl + 1 > buf.length)
          buf = java.util.Arrays.copyOf(buf,
            math.max(buf.length * 2, len + tl + 1))
        if (t > from) { buf(len) = 0x20; len += 1 }
        Platform.copyMemory(base, off + spans(2 * t), buf,
          Platform.BYTE_ARRAY_OFFSET + len, tl.toLong)
        len += tl
        t += 1
      }
      md5Prefix60(buf, len)
    }
    val out =
      if (cnt >= k) {
        val n = cnt - k + 1
        val a = new Array[Long](n)
        var i = 0
        while (i < n) { a(i) = gramHash(i, i + k); i += 1 }
        a
      } else Array(gramHash(0, cnt))
    UnsafeArrayData.fromPrimitiveArray(out)
  }

  /** 60-bit md5-family SimHash fingerprint — the fused kernel behind
    * the DRIVER simhash query ([[graft.llm.Dedup.simhashPairsExact]]).
    * Per whitespace token (every OCCURRENCE, not distinct): h = first
    * 60 md5 bits ([[md5Prefix60]]); bit b of the fingerprint is set iff
    * strictly more tokens have bit b set than clear (2*ones > total).
    * One pass, one digest per token, no hex strings, and the 60
    * per-bit HOF filter passes of the composed spelling collapse into
    * a vote array. Equality with that spelling is asserted in
    * FunctionsSpec.
    */
  def simhash60Md5(s: UTF8String): Long = {
    val base = s.getBaseObject
    val off = s.getBaseOffset
    val (spans, cnt) = tokenSpans(base, off, s.numBytes)
    val votes = new Array[Int](60)
    var buf = new Array[Byte](64)
    var t = 0
    while (t < cnt) {
      val tl = spans(2 * t + 1) - spans(2 * t)
      if (tl > buf.length) buf = new Array[Byte](math.max(buf.length * 2, tl))
      Platform.copyMemory(base, off + spans(2 * t), buf,
        Platform.BYTE_ARRAY_OFFSET, tl.toLong)
      val h = md5Prefix60(buf, tl)
      var b = 0
      while (b < 60) { votes(b) += ((h >>> b) & 1L).toInt; b += 1 }
      t += 1
    }
    var sig = 0L
    var b = 0
    while (b < 60) {
      if (2 * votes(b) > cnt) sig |= (1L << b)
      b += 1
    }
    sig
  }

  /** sorted distinct xxhash64 of each n-token shingle (tokens joined by
    * 0x20, same shingle convention as [[minhashSignature]]; a document
    * with fewer than n tokens contributes its whole token string as one
    * shingle). The per-document input for EXACT shingle-Jaccard via
    * [[SortedJaccard]].
    */
  def hashedSortedShingles(s: UTF8String, n: Int): ArrayData = {
    val base = s.getBaseObject
    val off = s.getBaseOffset
    val (spans, cnt) = tokenSpans(base, off, s.numBytes)
    var buf = new Array[Byte](64)
    def shingleHash(from: Int, until: Int): Long = {
      var len = 0
      var t = from
      while (t < until) {
        val tl = spans(2 * t + 1) - spans(2 * t)
        if (len + tl + 1 > buf.length)
          buf = java.util.Arrays.copyOf(buf, math.max(buf.length * 2, len + tl + 1))
        if (t > from) { buf(len) = 0x20; len += 1 }
        Platform.copyMemory(base, off + spans(2 * t), buf,
          Platform.BYTE_ARRAY_OFFSET + len, tl.toLong)
        len += tl
        t += 1
      }
      XXH64.hashUnsafeBytes(buf, Platform.BYTE_ARRAY_OFFSET, len, HashSeed)
    }
    val hs =
      if (cnt >= n) Array.tabulate(cnt - n + 1)(i => shingleHash(i, i + n))
      else Array(shingleHash(0, cnt))
    java.util.Arrays.sort(hs)
    var w = 0
    var r = 0
    while (r < hs.length) {
      if (w == 0 || hs(w - 1) != hs(r)) { hs(w) = hs(r); w += 1 }
      r += 1
    }
    UnsafeArrayData.fromPrimitiveArray(java.util.Arrays.copyOf(hs, w))
  }

  /** Per-document term frequencies over LETTER-RUN tokens (the
    * reference tokenizer: maximal runs of Unicode category-L code
    * points, `Character.isLetter` == Java regex `\p{L}`), as a
    * string->count map with keys in sorted order (deterministic map
    * layout). Makes the TF stage of TF-IDF-style pipelines MAP-ONLY:
    * the (doc, token)-granularity shuffle collapses to
    * (doc, distinct-token) rows emitted by exploding the map.
    */
  def tokenCounts(s: UTF8String): org.apache.spark.sql.catalyst.util.MapData = {
    val str = s.toString
    val m = new java.util.TreeMap[String, Long]()
    val n = str.length
    var i = 0
    var start = -1
    def flush(end: Int): Unit =
      if (start >= 0) {
        val w = str.substring(start, end)
        m.merge(w, 1L, (a, b) => a + b)
        start = -1
      }
    while (i < n) {
      val cp = str.codePointAt(i)
      if (Character.isLetter(cp)) { if (start < 0) start = i }
      else flush(i)
      i += Character.charCount(cp)
    }
    flush(n)
    val keys = new Array[AnyRef](m.size)
    val vals = new Array[Any](m.size)
    var j = 0
    val it = m.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      keys(j) = UTF8String.fromString(e.getKey)
      vals(j) = e.getValue
      j += 1
    }
    org.apache.spark.sql.catalyst.util.ArrayBasedMapData(
      keys.asInstanceOf[Array[Any]], vals)
  }

  /** All code-point n-grams of `s`, equal to
    * `substr(s, i, n) for i in 1..numChars-n+1` (code-point windows,
    * matching SQL substring semantics for non-ASCII too). One byte scan
    * finds code-point starts; each n-gram is a byte-range slice.
    *
    * Exists so `explode(char_ngrams(text, n))` generates SHORT strings:
    * the explode-an-index-sequence formulation carried the whole
    * document text into every generated row (O(len^2) bytes copied per
    * document through the Generate operator).
    */
  def charNgrams(s: UTF8String, n: Int): ArrayData = {
    val bytes = s.getBytes
    // byte offset of each code-point start (UTF-8 continuation bytes
    // are 10xxxxxx)
    var offs = new Array[Int](math.max(16, bytes.length + 1))
    var chars = 0
    var b = 0
    while (b < bytes.length) {
      if ((bytes(b) & 0xc0) != 0x80) {
        offs(chars) = b
        chars += 1
      }
      b += 1
    }
    offs(chars) = bytes.length
    if (chars < n) return new org.apache.spark.sql.catalyst.util.GenericArrayData(Array.empty[Any])
    val out = new Array[Any](chars - n + 1)
    var i = 0
    while (i <= chars - n) {
      out(i) = UTF8String.fromBytes(bytes, offs(i), offs(i + n) - offs(i))
      i += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }

  /** Unicode NFC normalization + ROOT-locale lowercase — the canonical
    * form for normalization-robust dedup (é as e+combining-acute vs
    * precomposed é, case variants). ASCII fast path: a pure-ASCII
    * string (the overwhelming case in a web corpus) lowercases
    * byte-wise with no Normalizer call and no String round-trip.
    */
  def nfcLower(s: UTF8String): UTF8String = {
    val bytes = s.getBytes
    var i = 0
    var ascii = true
    while (ascii && i < bytes.length) {
      if ((bytes(i) & 0x80) != 0) ascii = false
      i += 1
    }
    if (ascii) {
      var lower: Array[Byte] = null
      var j = 0
      while (j < bytes.length) {
        val b = bytes(j)
        if (b >= 'A' && b <= 'Z') {
          if (lower == null) lower = bytes.clone()
          lower(j) = (b + 32).toByte
        }
        j += 1
      }
      if (lower == null) s else UTF8String.fromBytes(lower)
    } else {
      UTF8String.fromString(
        java.text.Normalizer.normalize(s.toString,
          java.text.Normalizer.Form.NFC)
          .toLowerCase(java.util.Locale.ROOT))
    }
  }

  /** min over elements of (x*a + b) % prime, skipping null elements —
    * bit-identical to `array_min(transform(hh, h -> (h * a + b) % p))`
    * (null on an empty / all-null array, exactly ArrayMin's contract).
    * Kernel behind [[AffineMinMod]], the
    * [[graft.plans.MinhashSqlKernelRule]] rewrite target.
    */
  def affineMinMod(
      arr: ArrayData, a: Long, b: Long, prime: Long): java.lang.Long = {
    val n = arr.numElements()
    var min = Long.MaxValue
    var seen = false
    var i = 0
    while (i < n) {
      if (!arr.isNullAt(i)) {
        val v = (arr.getLong(i) * a + b) % prime
        if (!seen || v < min) { min = v; seen = true }
      }
      i += 1
    }
    if (seen) java.lang.Long.valueOf(min) else null
  }

  /** Per element: first-4-md5-bytes-as-unsigned-32-bit of the UTF-8
    * string, mod `prime`; null elements stay null — bit-identical to
    * `transform(ss, s -> CAST(conv(substring(md5(CAST(s AS BINARY)),
    * 1, 8), 16, 10) AS BIGINT) % p)` without the 32-char hex string or
    * the interpreted per-element lambda. Kernel behind [[Md5Head8Mod]].
    */
  def md5Head8Mod(arr: ArrayData, prime: Long): ArrayData = {
    val n = arr.numElements()
    val out = new Array[Any](n)
    val md = md5Local.get()
    var i = 0
    while (i < n) {
      if (!arr.isNullAt(i)) {
        val bytes = arr.getUTF8String(i).getBytes
        md.reset()
        md.update(bytes, 0, bytes.length)
        val d = md.digest()
        val h = ((d(0) & 0xffL) << 24) | ((d(1) & 0xffL) << 16) |
          ((d(2) & 0xffL) << 8) | (d(3) & 0xffL)
        out(i) = java.lang.Long.valueOf(h % prime)
      }
      i += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }
}

/** affine_min_mod(hh, a, b, p): the fused form of
  * `array_min(transform(hh, h -> (h * a + b) % p))` — one MinHash
  * permutation's running min as a tight long loop instead of an
  * interpreted per-element lambda plus a materialized intermediate
  * array. Installed by [[graft.plans.MinhashSqlKernelRule]] so the
  * spec-pinned SQL faces get the kernel without their text changing.
  */
case class AffineMinMod(child: Expression, a: Long, b: Long, prime: Long)
    extends UnaryExpression {

  override def prettyName: String = "affine_min_mod"
  override def dataType: DataType = LongType
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
      case dt => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires array<bigint>, got ${dt.catalogString}")
    }

  override def nullSafeEval(input: Any): Any =
    TextKernels.affineMinMod(input.asInstanceOf[ArrayData], a, b, prime)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val r = ctx.freshName("amm")
      s"""
         |java.lang.Long $r =
         |  graft.functions.TextKernels.affineMinMod($c, ${a}L, ${b}L, ${prime}L);
         |if ($r == null) { ${ev.isNull} = true; }
         |else { ${ev.value} = $r.longValue(); }
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** md5_head8_mod(ss, p): the fused form of
  * `transform(ss, s -> CAST(conv(substring(md5(CAST(s AS BINARY)), 1,
  * 8), 16, 10) AS BIGINT) % p)` — see [[TextKernels.md5Head8Mod]].
  */
case class Md5Head8Mod(child: Expression, prime: Long)
    extends UnaryExpression {

  override def prettyName: String = "md5_head8_mod"
  override def dataType: DataType = ArrayType(LongType, containsNull = true)

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
      case dt => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires array<string>, got ${dt.catalogString}")
    }

  override def nullSafeEval(input: Any): Any =
    TextKernels.md5Head8Mod(input.asInstanceOf[ArrayData], prime)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.TextKernels.md5Head8Mod($c, ${prime}L)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Base for the string -> kernel expressions: null-safe, codegen emits
  * a single static call into [[TextKernels]] so the surrounding
  * operators stay inside whole-stage codegen.
  */
abstract class TextKernelExpression extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string argument, got ${child.dataType.catalogString}")
}

/** hashed_sorted_tokens(text): sorted distinct xxhash64 of each
  * whitespace token — see [[TextKernels.hashedSortedTokens]].
  */
case class HashedSortedTokens(child: Expression) extends TextKernelExpression {
  override def prettyName: String = "hashed_sorted_tokens"
  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def nullSafeEval(input: Any): Any =
    TextKernels.hashedSortedTokens(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.TextKernels.hashedSortedTokens($c)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** hashed_sorted_shingles(text, n): sorted distinct xxhash64 of n-token
  * shingles — see [[TextKernels.hashedSortedShingles]].
  */
case class HashedSortedShingles(child: Expression, n: Int)
    extends TextKernelExpression {
  require(n >= 1, "n must be >= 1")
  override def prettyName: String = "hashed_sorted_shingles"
  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def nullSafeEval(input: Any): Any =
    TextKernels.hashedSortedShingles(input.asInstanceOf[UTF8String], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.TextKernels.hashedSortedShingles($c, $n)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** simhash64(text): 64-bit SimHash fingerprint — see
  * [[TextKernels.simhash64]].
  */
case class SimHash64(child: Expression) extends TextKernelExpression {
  override def prettyName: String = "simhash64"
  override def dataType: DataType = LongType

  override def nullSafeEval(input: Any): Any =
    TextKernels.simhash64(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.TextKernels.simhash64($c)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** minhash_signature(text): k-component MinHash signature with the
  * given affine permutations — see [[TextKernels.minhashSignature]].
  * Coefficients are Seq (value equality) so identical calls
  * canonicalize together for subplan/exchange reuse.
  */
case class MinHashSignature(
    child: Expression,
    aCoeffs: Seq[Long],
    bCoeffs: Seq[Long],
    prime: Long) extends TextKernelExpression {
  require(aCoeffs.length == bCoeffs.length && aCoeffs.nonEmpty,
    "aCoeffs/bCoeffs must be same nonempty length")

  override def prettyName: String = "minhash_signature"
  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  @transient private lazy val aArr = aCoeffs.toArray
  @transient private lazy val bArr = bCoeffs.toArray

  override def nullSafeEval(input: Any): Any =
    TextKernels.minhashSignature(
      input.asInstanceOf[UTF8String], aArr, bArr, prime)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val aRef = ctx.addReferenceObj("mhACoeffs", aArr, "long[]")
    val bRef = ctx.addReferenceObj("mhBCoeffs", bArr, "long[]")
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.TextKernels.minhashSignature($c, $aRef, $bRef, ${prime}L)")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** minhash_signature_md5(text): the md5-family MinHash signature —
  * see [[TextKernels.minhashSignatureMd5]].
  */
case class MinHashSignatureMd5(
    child: Expression,
    aCoeffs: Seq[Long],
    bCoeffs: Seq[Long],
    prime: Long) extends TextKernelExpression {
  require(aCoeffs.length == bCoeffs.length && aCoeffs.nonEmpty,
    "aCoeffs/bCoeffs must be same nonempty length")

  override def prettyName: String = "minhash_signature_md5"
  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  @transient private lazy val aArr = aCoeffs.toArray
  @transient private lazy val bArr = bCoeffs.toArray

  override def nullSafeEval(input: Any): Any =
    TextKernels.minhashSignatureMd5(
      input.asInstanceOf[UTF8String], aArr, bArr, prime)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val aRef = ctx.addReferenceObj("mhACoeffs", aArr, "long[]")
    val bRef = ctx.addReferenceObj("mhBCoeffs", bArr, "long[]")
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.TextKernels.minhashSignatureMd5($c, $aRef, $bRef, ${prime}L)")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** winnow_grams_md5(text, k): md5-prefix-60 hash per k-token gram —
  * see [[TextKernels.winnowGramHashes]].
  */
case class WinnowGramHashes(child: Expression, k: Int)
    extends TextKernelExpression {
  require(k >= 1, "k must be >= 1")
  override def prettyName: String = "winnow_grams_md5"
  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def nullSafeEval(input: Any): Any =
    TextKernels.winnowGramHashes(input.asInstanceOf[UTF8String], k)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.TextKernels.winnowGramHashes($c, $k)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** simhash60_md5(text): 60-bit md5-family SimHash — see
  * [[TextKernels.simhash60Md5]].
  */
case class SimHash60Md5(child: Expression) extends TextKernelExpression {
  override def prettyName: String = "simhash60_md5"
  override def dataType: DataType = LongType

  override def nullSafeEval(input: Any): Any =
    TextKernels.simhash60Md5(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.TextKernels.simhash60Md5($c)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** token_counts(text): letter-run term-frequency map — see
  * [[TextKernels.tokenCounts]].
  */
case class TokenCounts(child: Expression) extends TextKernelExpression {
  override def prettyName: String = "token_counts"
  override def dataType: DataType =
    MapType(StringType, LongType, valueContainsNull = false)

  override def nullSafeEval(input: Any): Any =
    TextKernels.tokenCounts(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.TextKernels.tokenCounts($c)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** char_ngrams(text, n): all code-point n-grams — see
  * [[TextKernels.charNgrams]]. `n` is a plan-time constant.
  */
case class CharNgrams(child: Expression, n: Int) extends TextKernelExpression {
  require(n >= 1, "n must be >= 1")
  override def prettyName: String = "char_ngrams"
  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def nullSafeEval(input: Any): Any =
    TextKernels.charNgrams(input.asInstanceOf[UTF8String], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.TextKernels.charNgrams($c, $n)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** nfc_lower(text): NFC-normalized, ROOT-lowercased text — see
  * [[TextKernels.nfcLower]].
  */
case class NfcLower(child: Expression) extends TextKernelExpression {
  override def prettyName: String = "nfc_lower"
  override def dataType: DataType = StringType

  override def nullSafeEval(input: Any): Any =
    TextKernels.nfcLower(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.TextKernels.nfcLower($c)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Column-level entry points. */
object text {
  import org.apache.spark.sql.graftbridge.Bridge

  def nfc_lower(c: Column): Column =
    Bridge.column(NfcLower(Bridge.expression(c)))

  def hashed_sorted_tokens(c: Column): Column =
    Bridge.column(HashedSortedTokens(Bridge.expression(c)))

  def simhash64(c: Column): Column =
    Bridge.column(SimHash64(Bridge.expression(c)))

  def minhash_signature(
      c: Column, a: Seq[Long], b: Seq[Long], prime: Long): Column =
    Bridge.column(MinHashSignature(Bridge.expression(c), a, b, prime))

  def minhash_signature_md5(
      c: Column, a: Seq[Long], b: Seq[Long], prime: Long): Column =
    Bridge.column(MinHashSignatureMd5(Bridge.expression(c), a, b, prime))

  def simhash60_md5(c: Column): Column =
    Bridge.column(SimHash60Md5(Bridge.expression(c)))

  def winnow_grams_md5(c: Column, k: Int): Column =
    Bridge.column(WinnowGramHashes(Bridge.expression(c), k))

  def char_ngrams(c: Column, n: Int): Column =
    Bridge.column(CharNgrams(Bridge.expression(c), n))

  def token_counts(c: Column): Column =
    Bridge.column(TokenCounts(Bridge.expression(c)))

  def hashed_sorted_shingles(c: Column, n: Int): Column =
    Bridge.column(HashedSortedShingles(Bridge.expression(c), n))
}
