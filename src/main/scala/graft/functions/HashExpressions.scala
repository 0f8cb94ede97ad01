package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Native Catalyst expressions (with `doGenCode`) for the signature
  * computations that dominate the dedup/similarity hot paths.
  *
  * The declarative `aggregate`/`zip_with` formulations are correct but
  * interpreted: Spark's higher-order functions evaluate their lambda per
  * element through the expression interpreter, boxing every long. For a
  * 100 TB corpus the signature stage runs over every document, so these
  * compile to tight primitive loops instead (preference order per the
  * engine design notes: builtins > native Expression > UDF).
  */
object HashExpressions {

  /** 2^31-1; products with <2^31 multipliers stay inside a long. */
  val MinhashPrime: Long = 2147483647L

  /** Deterministic per-permutation multipliers (splitmix64 of the index),
    * shared with the declarative [[graft.dedup.Dedup]] formulation. */
  def perm(i: Int): (Long, Long) = {
    var z = i.toLong * 0x9E3779B97F4A7C15L + 0x12345678L
    z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
    z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
    val a = math.abs(z ^ (z >>> 31)) % (MinhashPrime - 1) + 1
    val b = math.abs(z * 0x2545F4914F6CDD1DL) % MinhashPrime
    (a, b)
  }

  private def hashUtf8(s: org.apache.spark.unsafe.types.UTF8String): Long =
    XXH64.hashUnsafeBytes(s.getBaseObject, s.getBaseOffset, s.numBytes, 42L)

  /** FNV-1a/32 offset bases for the reproducible hash mode: the standard
    * basis plus a second, distinct basis so two independent 32-bit
    * streams can be packed into one wide hash. */
  val FnvBasisA = 2166136261L // 0x811C9DC5, the standard FNV-1a/32 basis
  // 0xD444C890 — a fixed second basis. This LITERAL is the spec: any
  // engine reproducing the packed hash must start stream B from exactly
  // 3561277584 (the d4 oracle inlines it). It is close to, but NOT,
  // basisA ^ 0x55555555 (that would be 0xD449C890) — do not re-derive.
  val FnvBasisB = 3561277584L

  private def fnv1a32Bytes(bytes: Array[Byte], from: Int, until: Int, basis: Long): Long = {
    var h = basis
    var i = from
    while (i < until) { h = ((h ^ (bytes(i) & 0xFF)) * 16777619L) & 0xFFFFFFFFL; i += 1 }
    h
  }

  /** Reproducible 63-bit token/shingle hash: two FNV-1a/32 streams packed
    * as `a | ((b & 0x7FFFFFFF) << 32)`. Bit 63 is always clear, keeping
    * every derived value nonnegative — chosen so a SQL oracle (64-bit
    * signed integers, overflow-checked) can replicate the construction
    * exactly. The engine default remains xxHash64 (wider, faster); this
    * mode trades a collision bit for cross-engine bit-reproducibility
    * of signatures (e.g. deduping against an index another system
    * built). Byte-wise over UTF-8 — equals a per-code-point fold for
    * ASCII corpora, which is what SQL `ascii()` recipes compute. */
  private def fnv63(bytes: Array[Byte], from: Int, until: Int): Long =
    fnv1a32Bytes(bytes, from, until, FnvBasisA) |
      ((fnv1a32Bytes(bytes, from, until, FnvBasisB) & 0x7FFFFFFFL) << 32)

  /** array<long> raw shingle hashes → array<long> minhash signature. */
  case class MinHashSignature(child: Expression, numHashes: Int)
    extends UnaryExpression {

    private lazy val (as, bs) = {
      val ps = (0 until numHashes).map(perm)
      (ps.map(_._1).toArray, ps.map(_._2).toArray)
    }

    override def dataType: DataType = ArrayType(LongType, containsNull = false)
    override def prettyName: String = "minhash_signature"

    override def nullSafeEval(input: Any): Any = {
      val arr = input.asInstanceOf[ArrayData]
      val mins = Array.fill(numHashes)(MinhashPrime)
      var i = 0
      while (i < arr.numElements()) {
        val h = java.lang.Math.floorMod(arr.getLong(i), MinhashPrime)
        var j = 0
        while (j < numHashes) {
          val v = java.lang.Math.floorMod(h * as(j) + bs(j), MinhashPrime)
          if (v < mins(j)) mins(j) = v
          j += 1
        }
        i += 1
      }
      new GenericArrayData(mins)
    }

    override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val aRef = ctx.addReferenceObj("mhA", as, "long[]")
      val bRef = ctx.addReferenceObj("mhB", bs, "long[]")
      nullSafeCodeGen(ctx, ev, c => {
        val mins = ctx.freshName("mins")
        val i = ctx.freshName("i")
        val j = ctx.freshName("j")
        val h = ctx.freshName("h")
        val v = ctx.freshName("v")
        s"""
        long[] $mins = new long[$numHashes];
        java.util.Arrays.fill($mins, ${MinhashPrime}L);
        for (int $i = 0; $i < $c.numElements(); $i++) {
          long $h = java.lang.Math.floorMod($c.getLong($i), ${MinhashPrime}L);
          for (int $j = 0; $j < $numHashes; $j++) {
            long $v = java.lang.Math.floorMod($h * $aRef[$j] + $bRef[$j], ${MinhashPrime}L);
            if ($v < $mins[$j]) $mins[$j] = $v;
          }
        }
        ${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($mins);
        """
      })
    }

    override protected def withNewChildInternal(newChild: Expression): MinHashSignature =
      copy(child = newChild)
  }

  /** array<string> tokens → 64-bit SimHash fingerprint (Charikar '02). */
  case class SimHash64(child: Expression)
    extends UnaryExpression {

    override def dataType: DataType = LongType
    override def prettyName: String = "simhash64"

    override def nullSafeEval(input: Any): Any = {
      val arr = input.asInstanceOf[ArrayData]
      val counts = new Array[Int](64)
      var i = 0
      while (i < arr.numElements()) {
        if (!arr.isNullAt(i)) {
          val h = hashUtf8(arr.getUTF8String(i))
          var j = 0
          while (j < 64) {
            if (((h >>> j) & 1L) == 1L) counts(j) += 1 else counts(j) -= 1
            j += 1
          }
        }
        i += 1
      }
      var out = 0L
      var j = 0
      while (j < 64) { if (counts(j) > 0) out |= (1L << j); j += 1 }
      out
    }

    override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, c => {
        val counts = ctx.freshName("counts")
        val i = ctx.freshName("i")
        val j = ctx.freshName("j")
        val h = ctx.freshName("h")
        val s = ctx.freshName("s")
        val out = ctx.freshName("out")
        s"""
        int[] $counts = new int[64];
        for (int $i = 0; $i < $c.numElements(); $i++) {
          if (!$c.isNullAt($i)) {
            UTF8String $s = $c.getUTF8String($i);
            long $h = org.apache.spark.sql.catalyst.expressions.XXH64.hashUnsafeBytes(
              $s.getBaseObject(), $s.getBaseOffset(), $s.numBytes(), 42L);
            for (int $j = 0; $j < 64; $j++) {
              if ((($h >>> $j) & 1L) == 1L) $counts[$j]++; else $counts[$j]--;
            }
          }
        }
        long $out = 0L;
        for (int $j = 0; $j < 64; $j++) {
          if ($counts[$j] > 0) $out |= (1L << $j);
        }
        ${ev.value} = $out;
        """
      })

    override protected def withNewChildInternal(newChild: Expression): SimHash64 =
      copy(child = newChild)
  }

  /** array<double> × array<double> → dot product (null if either side is
    * null; lengths must match — extra elements on the longer side are
    * ignored). */
  case class DotProduct(left: Expression, right: Expression)
    extends BinaryExpression {

    override def dataType: DataType = DoubleType
    override def prettyName: String = "dot_product"

    override def nullSafeEval(a: Any, b: Any): Any = {
      val x = a.asInstanceOf[ArrayData]
      val y = b.asInstanceOf[ArrayData]
      val n = math.min(x.numElements(), y.numElements())
      var acc = 0.0
      var i = 0
      while (i < n) { acc += x.getDouble(i) * y.getDouble(i); i += 1 }
      acc
    }

    override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, (a, b) => {
        val n = ctx.freshName("n")
        val i = ctx.freshName("i")
        val acc = ctx.freshName("acc")
        s"""
        int $n = java.lang.Math.min($a.numElements(), $b.numElements());
        double $acc = 0.0;
        for (int $i = 0; $i < $n; $i++) {
          $acc += $a.getDouble($i) * $b.getDouble($i);
        }
        ${ev.value} = $acc;
        """
      })

    override protected def withNewChildrenInternal(
        newLeft: Expression, newRight: Expression): DotProduct =
      copy(left = newLeft, right = newRight)
  }

  /** string text → array<long>: xxhash64 of every word k-shingle,
    * sorted + distinct. One JVM pass per document: tokenize on single
    * spaces (empty tokens skipped), join each k-shingle with ' ' into a
    * reusable buffer, hash its UTF-8 bytes. Produces exactly
    * `array_sort(transform(shingles(text,k), xxhash64))` — the
    * declarative form evaluates interpreted per shingle, this runs once
    * per row. Short docs (< k tokens) hash the whole token join;
    * tokenless docs hash the empty string (matching `concat_ws`). */
  case class ShingleHashes(child: Expression, k: Int, fnv: Boolean = false)
    extends UnaryExpression
    with org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback {
    // CodegenFallback by choice: the body allocates span lists and a
    // growable buffer — an array-producing expression already sits at a
    // codegen pipeline boundary (the consumer is an explode/aggregate),
    // so a generated copy of this loop would buy nothing measurable.

    override def dataType: DataType = ArrayType(LongType, containsNull = false)
    override def prettyName: String = "shingle_hashes"

    override def nullSafeEval(input: Any): Any = {
      val bytes = input.asInstanceOf[org.apache.spark.unsafe.types.UTF8String].getBytes
      // token spans [start, end)
      val starts = new java.util.ArrayList[Int]()
      val ends = new java.util.ArrayList[Int]()
      var i = 0
      while (i < bytes.length) {
        while (i < bytes.length && bytes(i) == ' ') i += 1
        if (i < bytes.length) {
          starts.add(i)
          while (i < bytes.length && bytes(i) != ' ') i += 1
          ends.add(i)
        }
      }
      val n = starts.size()
      var buf = new Array[Byte](256)
      def hashShingle(from: Int, until: Int): Long = {
        var len = 0
        var t = from
        while (t < until) {
          val tokLen = ends.get(t) - starts.get(t)
          val need = len + tokLen + 1
          if (need > buf.length) buf = java.util.Arrays.copyOf(buf, math.max(need, buf.length * 2))
          if (t > from) { buf(len) = ' '; len += 1 }
          System.arraycopy(bytes, starts.get(t), buf, len, tokLen)
          len += tokLen
          t += 1
        }
        if (fnv) fnv1a32Bytes(buf, 0, len, FnvBasisA)
        else XXH64.hashUnsafeBytes(buf, org.apache.spark.unsafe.Platform.BYTE_ARRAY_OFFSET, len, 42L)
      }
      val out: Array[Long] =
        if (n < k) Array(hashShingle(0, n))
        else {
          val arr = new Array[Long](n - k + 1)
          var s = 0
          while (s <= n - k) { arr(s) = hashShingle(s, s + k); s += 1 }
          arr
        }
      java.util.Arrays.sort(out)
      // in-place dedup of the sorted hashes
      var w = 0
      var r = 0
      while (r < out.length) {
        if (r == 0 || out(r) != out(r - 1)) { out(w) = out(r); w += 1 }
        r += 1
      }
      new GenericArrayData(java.util.Arrays.copyOf(out, w))
    }

    override protected def withNewChildInternal(newChild: Expression): ShingleHashes =
      copy(child = newChild)
  }

  /** text → occurrence count of the document's most frequent k-token
    * shingle, computed ROW-LOCALLY in one JVM pass: hash every shingle
    * position (NO dedup, unlike [[ShingleHashes]]), sort the longs, and
    * return the longest equal run. 0 when the document has fewer than k
    * tokens. 64-bit collisions merging two distinct shingles' runs are
    * negligible at document sizes.
    *
    * This is the shuffle-free form of "per-document n-gram mode count"
    * (the Gopher top-bigram repetition rule): the explode → groupBy
    * (doc, shingle) → max formulation shuffles corpus×tokens rows —
    * measured 39 s at 500k docs where this pass is ~6 s. */
  case class MaxShingleRunCount(child: Expression, k: Int)
    extends UnaryExpression
    with org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback {

    override def dataType: DataType = IntegerType
    override def prettyName: String = "max_shingle_run_count"

    override def nullSafeEval(input: Any): Any = {
      val bytes = input.asInstanceOf[org.apache.spark.unsafe.types.UTF8String].getBytes
      val starts = new java.util.ArrayList[Int]()
      val ends = new java.util.ArrayList[Int]()
      var i = 0
      while (i < bytes.length) {
        while (i < bytes.length && bytes(i) == ' ') i += 1
        if (i < bytes.length) {
          starts.add(i)
          while (i < bytes.length && bytes(i) != ' ') i += 1
          ends.add(i)
        }
      }
      val n = starts.size()
      if (n < k) return 0
      var buf = new Array[Byte](256)
      def hashShingle(from: Int, until: Int): Long = {
        var len = 0
        var t = from
        while (t < until) {
          val tokLen = ends.get(t) - starts.get(t)
          val need = len + tokLen + 1
          if (need > buf.length) buf = java.util.Arrays.copyOf(buf, math.max(need, buf.length * 2))
          if (t > from) { buf(len) = ' '; len += 1 }
          System.arraycopy(bytes, starts.get(t), buf, len, tokLen)
          len += tokLen
          t += 1
        }
        XXH64.hashUnsafeBytes(buf, org.apache.spark.unsafe.Platform.BYTE_ARRAY_OFFSET, len, 42L)
      }
      val arr = new Array[Long](n - k + 1)
      var s = 0
      while (s <= n - k) { arr(s) = hashShingle(s, s + k); s += 1 }
      java.util.Arrays.sort(arr)
      var best = 1
      var run = 1
      var r = 1
      while (r < arr.length) {
        if (arr(r) == arr(r - 1)) { run += 1; if (run > best) best = run }
        else run = 1
        r += 1
      }
      best
    }

    override protected def withNewChildInternal(newChild: Expression): MaxShingleRunCount =
      copy(child = newChild)
  }

  /** string text → 64-bit SimHash over DISTINCT whitespace tokens, in
    * one JVM pass (tokenize + dedup + bit counting). Equivalent to
    * `SimHash64(array_distinct(filter(split(text,' '), _ != '')))`. */
  case class SimHashText(child: Expression, fnv: Boolean = false)
    extends UnaryExpression
    with org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback {
    // CodegenFallback by choice: needs a per-row hash set for token
    // dedup plus a 64-slot counter array — object-allocating bodies gain
    // nothing from a generated copy of the same loop.

    override def dataType: DataType = LongType
    override def prettyName: String = "simhash_text"

    override def nullSafeEval(input: Any): Any = {
      val bytes = input.asInstanceOf[org.apache.spark.unsafe.types.UTF8String].getBytes
      val seen = new java.util.HashSet[java.lang.Long]()
      val counts = new Array[Int](64)
      var i = 0
      while (i < bytes.length) {
        while (i < bytes.length && bytes(i) == ' ') i += 1
        if (i < bytes.length) {
          val s = i
          while (i < bytes.length && bytes(i) != ' ') i += 1
          val h = if (fnv) fnv63(bytes, s, i)
            else XXH64.hashUnsafeBytes(bytes,
              org.apache.spark.unsafe.Platform.BYTE_ARRAY_OFFSET + s, i - s, 42L)
          if (seen.add(h)) {
            var j = 0
            while (j < 64) {
              if (((h >>> j) & 1L) == 1L) counts(j) += 1 else counts(j) -= 1
              j += 1
            }
          }
        }
      }
      var out = 0L
      var j = 0
      while (j < 64) { if (counts(j) > 0) out |= (1L << j); j += 1 }
      out
    }

    override protected def withNewChildInternal(newChild: Expression): SimHashText =
      copy(child = newChild)
  }

  /** Count of common elements between two SORTED long arrays (merge
    * scan, O(n+m), no boxing). Inputs must be duplicate-free and sorted
    * ascending (`array_sort(array_distinct(...))`). */
  case class IntersectCountSorted(left: Expression, right: Expression)
    extends BinaryExpression {

    override def dataType: DataType = IntegerType
    override def prettyName: String = "intersect_count_sorted"

    override def nullSafeEval(a: Any, b: Any): Any = {
      val x = a.asInstanceOf[ArrayData]
      val y = b.asInstanceOf[ArrayData]
      var i = 0
      var j = 0
      var c = 0
      while (i < x.numElements() && j < y.numElements()) {
        val xv = x.getLong(i)
        val yv = y.getLong(j)
        if (xv == yv) { c += 1; i += 1; j += 1 }
        else if (xv < yv) i += 1
        else j += 1
      }
      c
    }

    override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, (a, b) => {
        val i = ctx.freshName("i")
        val j = ctx.freshName("j")
        val c = ctx.freshName("c")
        val xv = ctx.freshName("xv")
        val yv = ctx.freshName("yv")
        s"""
        int $i = 0; int $j = 0; int $c = 0;
        while ($i < $a.numElements() && $j < $b.numElements()) {
          long $xv = $a.getLong($i);
          long $yv = $b.getLong($j);
          if ($xv == $yv) { $c++; $i++; $j++; }
          else if ($xv < $yv) { $i++; } else { $j++; }
        }
        ${ev.value} = $c;
        """
      })

    override protected def withNewChildrenInternal(
        newLeft: Expression, newRight: Expression): IntersectCountSorted =
      copy(left = newLeft, right = newRight)
  }

  /** Bloom-filter membership probe against a broadcast filter, codegen'd.
    * Spark exposes no public `might_contain` in the Scala functions API
    * (the expression behind the runtime row-level filter is internal), so
    * without this the probe is a Scala UDF that boxes every long and
    * breaks whole-stage codegen on exactly the corpus-sized side the
    * Bloom pattern exists to keep cheap. The expression holds the
    * `Broadcast` HANDLE, not the filter: the serialized plan carries a
    * few bytes per task and the filter bits ship once per executor via
    * the broadcast machinery. Lifetime: the broadcast must stay valid for
    * every action on a plan containing this expression; once the plan is
    * unreachable, Spark's ContextCleaner reclaims the broadcast blocks —
    * callers that want deterministic release can eagerly materialize
    * (localCheckpoint) and then `destroy()`. Null input → null (falsy
    * under `filter`, matching the UDF-based predecessor). */
  case class BloomMightContain(child: Expression,
      filter: org.apache.spark.broadcast.Broadcast[
        org.apache.spark.util.sketch.BloomFilter])
    extends UnaryExpression {

    // enforce the LONG contract at analysis time: without it a non-long
    // child fails differently per path (interpreted ClassCastException
    // vs codegen widening/compile failure)
    override def checkInputDataTypes():
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
      if (child.dataType == LongType)
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"bloom_might_contain requires a LONG hash input, got ${child.dataType}")
    override def dataType: DataType = BooleanType
    override def prettyName: String = "bloom_might_contain"

    override def nullSafeEval(input: Any): Any =
      filter.value.mightContainLong(input.asInstanceOf[Long])

    override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      // reference the BROADCAST handle (a few bytes in the task binary;
      // addReferenceObj on filter.value would ship the bits per task),
      // but hoist the deserialized filter into lazily-initialized codegen
      // state: Broadcast.value() is memoized yet still a virtual call +
      // assertValid per row on exactly the probe hot path this expression
      // exists to keep cheap — resolve it once and probe the cached field.
      val bfRef = ctx.addReferenceObj("bloomBroadcast", filter,
        "org.apache.spark.broadcast.Broadcast")
      val bfField = ctx.addMutableState(
        "org.apache.spark.util.sketch.BloomFilter", "graftBloomFilter")
      nullSafeCodeGen(ctx, ev, c =>
        s"""
        if ($bfField == null) {
          $bfField = (org.apache.spark.util.sketch.BloomFilter) $bfRef.value();
        }
        ${ev.value} = $bfField.mightContainLong($c);""")
    }

    override protected def withNewChildInternal(newChild: Expression): BloomMightContain =
      copy(child = newChild)
  }

  // ---- Column API ----------------------------------------------------

  private def toCol(e: Expression): Column =
    org.apache.spark.sql.graftshim.column(e)

  private def exprOf(c: Column): Expression =
    org.apache.spark.sql.graftshim.expression(c)

  /** `shingleHashes` must be the raw 64-bit shingle hashes (see
    * [[shingleHashes]]). */
  def minhashSignature(shingleHashes: Column, numHashes: Int = 64): Column =
    toCol(MinHashSignature(exprOf(shingleHashes), numHashes))

  def shingleHashes(text: Column, k: Int = 3, fnv: Boolean = false): Column =
    toCol(ShingleHashes(exprOf(text), k, fnv))

  /** `hash` must be a LONG column (xxhash64 / FNV shingle hash). */
  def bloomMightContain(hash: Column,
      bf: org.apache.spark.broadcast.Broadcast[
        org.apache.spark.util.sketch.BloomFilter]): Column =
    toCol(BloomMightContain(exprOf(hash), bf))

  def maxShingleRunCount(text: Column, k: Int): Column =
    toCol(MaxShingleRunCount(exprOf(text), k))

  def simhashText(text: Column, fnv: Boolean = false): Column =
    toCol(SimHashText(exprOf(text), fnv))

  def simhash64(tokens: Column): Column =
    toCol(SimHash64(exprOf(tokens)))

  def dotProduct(a: Column, b: Column): Column =
    toCol(DotProduct(exprOf(a), exprOf(b)))

  /** array<string> tokens → array<int>: per input set, how many tokens
    * are members. ONE pass over the token array for all sets — the
    * declarative form (`size(filter(toks, isin(...)))` per set) runs an
    * interpreted lambda per token PER SET; language ID + stopword
    * scoring together need six sets, so this collapses six interpreted
    * scans into one hash-lookup loop. CodegenFallback: the loop body is
    * the work; per-row dispatch is negligible. */
  case class TokenSetCounts(child: Expression, sets: Seq[Seq[String]])
    extends UnaryExpression
    with org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback {

    override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
    override def prettyName: String = "token_set_counts"

    @transient private lazy val lookup = {
      val m = new java.util.HashMap[org.apache.spark.unsafe.types.UTF8String, Array[Int]]()
      sets.zipWithIndex.foreach { case (set, i) =>
        set.foreach { s =>
          val k = org.apache.spark.unsafe.types.UTF8String.fromString(s)
          val prev = m.get(k)
          m.put(k, if (prev == null) Array(i) else prev :+ i)
        }
      }
      m
    }

    override def nullSafeEval(input: Any): Any = {
      val arr = input.asInstanceOf[ArrayData]
      val counts = new Array[Int](sets.size)
      var j = 0
      val n = arr.numElements()
      while (j < n) {
        val hit = lookup.get(arr.getUTF8String(j))
        if (hit != null) {
          var k = 0
          while (k < hit.length) { counts(hit(k)) += 1; k += 1 }
        }
        j += 1
      }
      new GenericArrayData(counts.map(c => c: Any))
    }

    override protected def withNewChildInternal(newChild: Expression): TokenSetCounts =
      copy(child = newChild)
  }

  def tokenSetCounts(toks: Column, sets: Seq[Seq[String]]): Column =
    toCol(TokenSetCounts(exprOf(toks), sets))

  /** string → FNV-1a/32 over Unicode CODE POINTS, masked into a long —
    * bit-identical to the declarative
    * `aggregate(transform(split(text,''), ascii), basis, ...)` form:
    * regex split("") divides between code points (a surrogate pair stays
    * one element) and `ascii` returns `codePointAt(0)`. Iterating UTF-16
    * units instead would fold the two surrogates of any non-BMP char
    * separately and diverge from the oracle. */
  case class Fnv1a32(child: Expression) extends UnaryExpression {

    override def dataType: DataType = LongType
    override def prettyName: String = "fnv1a32"

    override def nullSafeEval(input: Any): Any = {
      val s = input.asInstanceOf[org.apache.spark.unsafe.types.UTF8String].toString
      var h = 2166136261L
      var i = 0
      while (i < s.length) {
        val cp = s.codePointAt(i)
        h = ((h ^ cp.toLong) * 16777619L) & 0xFFFFFFFFL
        i += Character.charCount(cp)
      }
      h
    }

    // real doGenCode (not CodegenFallback): this expression sits in the
    // per-row hot path of hash sampling, split banding, and quota
    // ranking — falling back would break whole-stage codegen around
    // every such filter. The generated loop mirrors nullSafeEval
    // exactly (code-point fold, 32-bit masked).
    override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, c => {
        val s = ctx.freshName("s")
        val h = ctx.freshName("h")
        val i = ctx.freshName("i")
        val cp = ctx.freshName("cp")
        s"""
        String $s = $c.toString();
        long $h = 2166136261L;
        int $i = 0;
        while ($i < $s.length()) {
          int $cp = $s.codePointAt($i);
          $h = (($h ^ (long) $cp) * 16777619L) & 0xFFFFFFFFL;
          $i += java.lang.Character.charCount($cp);
        }
        ${ev.value} = $h;
        """
      })

    override protected def withNewChildInternal(newChild: Expression): Fnv1a32 =
      copy(child = newChild)
  }

  def fnv1a32(text: Column): Column = toCol(Fnv1a32(exprOf(text)))

  def intersectCountSorted(a: Column, b: Column): Column =
    toCol(IntersectCountSorted(exprOf(a), exprOf(b)))
}
