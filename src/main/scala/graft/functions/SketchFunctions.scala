package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}
import org.apache.spark.sql.GraftShim.{column => toCol, expression => toExpr}
import org.apache.spark.unsafe.types.UTF8String

/** Native text-sketch kernels for the dedup / fingerprint operators.
  *
  * Round-1 used Spark's higher-order builtins (`transform`/`aggregate`/
  * `slice`) for shingling and sketching; their lambdas are interpreted per
  * element, costing ~0.7 ms/document just to shingle — the dedup_minhash
  * BENCH outlier. These expressions compute the whole sketch per row in one
  * tight loop (sketching is embarrassingly per-row: no explode, no 64-wide
  * aggregate, no shuffle at all until the LSH band join).
  *
  * Hash dialect: shingle/word hashes are two Karp–Rabin polynomial hashes
  * mod the Mersenne prime 2^31−1 (bases 31 and 37) packed into 62 bits —
  * every intermediate stays < 2^36, so the identical value is computable in
  * plain 64-bit SQL arithmetic (the DuckDB oracles recompute it with
  * `list_reduce`). MinHash permutations stay Spark-side (XXH64.hashLong) —
  * the oracle verifies emitted pairs by exact Jaccard, not by signature.
  * Char values are Java UTF-16 code units; oracle parity assumes ASCII text
  * (asserted for the test corpus; real crawls would hash UTF-8 bytes on
  * both sides).
  */
object Sketch {

  val Mersenne31 = 2147483647L // 2^31 - 1

  /** Literal single-space split keeping empties — same list as Java
    * `split(" ", -1)` and DuckDB `string_split(s, ' ')`. */
  def splitSpace(s: String): Array[String] = {
    var count = 1
    var i = 0
    val n = s.length
    while (i < n) { if (s.charAt(i) == ' ') count += 1; i += 1 }
    val out = new Array[String](count)
    var start = 0
    var w = 0
    i = 0
    while (i < n) {
      if (s.charAt(i) == ' ') { out(w) = s.substring(start, i); w += 1; start = i + 1 }
      i += 1
    }
    out(w) = s.substring(start, n)
    out
  }

  /** 62-bit polynomial hash of the concatenation of words[from, from+k):
    * (poly37 << 31) | poly31, each mod 2^31−1, char-streamed (no garbage). */
  private def shingleHash(words: Array[String], from: Int, k: Int): Long = {
    var h1 = 0L
    var h2 = 0L
    var wi = from
    val end = from + k
    while (wi < end) {
      val w = words(wi)
      var ci = 0
      val wn = w.length
      while (ci < wn) {
        val c = w.charAt(ci).toLong
        h1 = (h1 * 31 + c) % Mersenne31
        h2 = (h2 * 37 + c) % Mersenne31
        ci += 1
      }
      wi += 1
    }
    (h2 << 31) | h1
  }

  /** Distinct k-word shingle hashes in first-occurrence order (matches
    * `array_distinct(transform(...))` from the column formulation and the
    * oracle's list_position-based first-occurrence filter). */
  def wordShingles(text: UTF8String, k: Int): ArrayData = {
    val words = splitSpace(text.toString)
    val n = words.length
    if (n < k) return new GenericArrayData(Array.emptyLongArray)
    val seen = new java.util.HashSet[java.lang.Long](n * 2)
    val out = new Array[Long](n - k + 1)
    var m = 0
    var i = 0
    while (i <= n - k) {
      val h = shingleHash(words, i, k)
      if (seen.add(h)) { out(m) = h; m += 1 }
      i += 1
    }
    new GenericArrayData(java.util.Arrays.copyOf(out, m))
  }

  /** 62-bit polynomial hash of the SPACE-JOINED words[from, from+k) — the
    * pre-image is the verbatim span text, so distinct token sequences can
    * never alias ("ab c d" vs "a bc d" concatenate to the same "abcd"
    * under [[shingleHash]] but hash differently here; words cannot contain
    * the space separator, so the join is injective). Required by span
    * REMOVAL semantics ([[graft.operators.Dedup.substringLevel]]): a
    * systematic alias there deletes text that was never duplicated. The
    * set-similarity operators keep the separator-free dialect — an alias
    * only perturbs a Jaccard estimate. */
  private def shingleHashJoined(words: Array[String], from: Int, k: Int): Long = {
    var h1 = 0L
    var h2 = 0L
    var wi = from
    val end = from + k
    while (wi < end) {
      if (wi > from) {
        h1 = (h1 * 31 + 32) % Mersenne31 // ' '
        h2 = (h2 * 37 + 32) % Mersenne31
      }
      val w = words(wi)
      var ci = 0
      val wn = w.length
      while (ci < wn) {
        val c = w.charAt(ci).toLong
        h1 = (h1 * 31 + c) % Mersenne31
        h2 = (h2 * 37 + c) % Mersenne31
        ci += 1
      }
      wi += 1
    }
    (h2 << 31) | h1
  }

  /** POSITIONED k-word shingle hashes: out(i) = hash62 of the SPACE-JOINED
    * span words[i, i+k) — NOT distinct (the span-level dedup operator
    * needs every occurrence's token offset). Same 31/37 Mersenne-31
    * arithmetic as [[wordShingles]] but over the joined span (see
    * [[shingleHashJoined]]); the DuckDB oracle recomputes identical values
    * from `w[i] || ' ' || …`. */
  def wordShinglesPos(text: UTF8String, k: Int): ArrayData = {
    val words = splitSpace(text.toString)
    val n = words.length
    if (n < k) return new GenericArrayData(Array.emptyLongArray)
    val out = new Array[Long](n - k + 1)
    var i = 0
    while (i <= n - k) {
      out(i) = shingleHashJoined(words, i, k)
      i += 1
    }
    new GenericArrayData(out)
  }

  /** MinHash signature: sig[j] = min over shingles of XXH64.hashLong(h, j)
    * (seed-j xxhash as the j-th permutation). Null when the doc has no
    * shingles (absent from the signature table, like the explode+agg
    * formulation). Duplicates need no dedup — min is idempotent. */
  def minhashSig(text: UTF8String, k: Int, numHashes: Int): ArrayData = {
    val words = splitSpace(text.toString)
    val n = words.length
    if (n < k) return null
    val sig = new Array[Long](numHashes)
    java.util.Arrays.fill(sig, Long.MaxValue)
    var i = 0
    while (i <= n - k) {
      val h = shingleHash(words, i, k)
      var j = 0
      while (j < numHashes) {
        val v = XXH64.hashLong(h, j)
        if (v < sig(j)) sig(j) = v
        j += 1
      }
      i += 1
    }
    new GenericArrayData(sig)
  }

  /** 62-bit SimHash over distinct words: bit j of the result is set iff
    * Σ_words (bit_j(hash62(w)) ? +1 : −1) > 0. Portable hash dialect — the
    * DuckDB oracle recomputes it exactly. */
  def simhash62(text: UTF8String): Long = {
    val words = splitSpace(text.toString)
    val seen = new java.util.HashSet[String](words.length * 2)
    val counts = new Array[Int](62)
    var i = 0
    while (i < words.length) {
      val w = words(i)
      if (seen.add(w)) {
        // single home for the 31/37 Mersenne-31 62-bit dialect: a 1-word
        // shingle hash IS the word hash (DuckDB oracle parity depends on
        // the two staying byte-identical)
        val h = shingleHash(words, i, 1)
        var j = 0
        while (j < 62) {
          if (((h >>> j) & 1L) == 1L) counts(j) += 1 else counts(j) -= 1
          j += 1
        }
      }
      i += 1
    }
    var sim = 0L
    var j = 0
    while (j < 62) {
      if (counts(j) > 0) sim |= (1L << j)
      j += 1
    }
    sim
  }

  /** Karp–Rabin fingerprint of the whole text: fold (acc·31 + char) mod
    * 2^31−1, init 0 — dialect-exact (cf. TextAnalysis round-1 column
    * formulation, now a single codegen'd loop). */
  def polyFingerprint(text: UTF8String): Long = {
    val s = text.toString
    var h = 0L
    var i = 0
    while (i < s.length) {
      h = (h * 31 + s.charAt(i)) % Mersenne31
      i += 1
    }
    h
  }

  /** Sign-of-projection LSH signature, bit-identical to the column
    * formulation in operators.Similarity.lshSignatureHof (parity-tested):
    * component i of plane p is two LCG rounds mod 2^31 over
    * 131p + 7919i + 12345, scaled to [−1, 1); the projection accumulates
    * left-to-right in double. Integer-exact + power-of-two scaling ⇒ the
    * DuckDB oracle recomputes identical signatures. */
  def lshSig(vec: ArrayData, planes: Int): Long = {
    val n = vec.numElements()
    var sig = 0L
    var p = 0
    while (p < planes) {
      var proj = 0.0
      var i = 0
      while (i < n) {
        val x0 = 131L * p + 7919L * i + 12345L
        val x1 = Math.floorMod(x0 * 1103515245L + 12345L, 2147483648L)
        val x2 = Math.floorMod(x1 * 1103515245L + 12345L, 2147483648L)
        proj += vec.getDouble(i) * (x2.toDouble / 1073741824.0 - 1.0)
        i += 1
      }
      if (proj > 0) sig |= (1L << p)
      p += 1
    }
    sig
  }
}

/** Column-API wrappers: thin codegen'd Catalyst expressions that call the
  * [[Sketch]] kernels (one static call per row keeps the generated code tiny
  * and inside whole-stage codegen; the loops JIT as ordinary JVM code). */
object SketchFunctions {

  abstract class SketchUnary extends UnaryExpression {
    protected def callExpr(childVar: String): String
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, c => s"${ev.value} = ${callExpr(c)};")
    override protected def withNewChildInternal(c: Expression): Expression
  }

  case class WordShingles(child: Expression, k: Int) extends SketchUnary {
    override def dataType: DataType = ArrayType(LongType, containsNull = false)
    override def prettyName: String = "word_shingles"
    override def nullSafeEval(t: Any): Any =
      Sketch.wordShingles(t.asInstanceOf[UTF8String], k)
    override protected def callExpr(c: String): String =
      s"graft.functions.Sketch.wordShingles($c, $k)"
    override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
  }

  case class WordShinglesPos(child: Expression, k: Int) extends SketchUnary {
    override def dataType: DataType = ArrayType(LongType, containsNull = false)
    override def prettyName: String = "word_shingles_pos"
    override def nullSafeEval(t: Any): Any =
      Sketch.wordShinglesPos(t.asInstanceOf[UTF8String], k)
    override protected def callExpr(c: String): String =
      s"graft.functions.Sketch.wordShinglesPos($c, $k)"
    override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
  }

  case class MinHashSig(child: Expression, k: Int, numHashes: Int) extends UnaryExpression {
    override def dataType: DataType = ArrayType(LongType, containsNull = false)
    override def nullable: Boolean = true
    override def prettyName: String = "minhash_sig"
    override def nullSafeEval(t: Any): Any =
      Sketch.minhashSig(t.asInstanceOf[UTF8String], k, numHashes)
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, c => s"""
        |${ev.value} = graft.functions.Sketch.minhashSig($c, $k, $numHashes);
        |${ev.isNull} = (${ev.value} == null);
       """.stripMargin)
    override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
  }

  case class SimHash62(child: Expression) extends SketchUnary {
    override def dataType: DataType = LongType
    override def prettyName: String = "simhash62"
    override def nullSafeEval(t: Any): Any =
      Sketch.simhash62(t.asInstanceOf[UTF8String])
    override protected def callExpr(c: String): String =
      s"graft.functions.Sketch.simhash62($c)"
    override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
  }

  case class PolyFingerprint(child: Expression) extends SketchUnary {
    override def dataType: DataType = LongType
    override def prettyName: String = "poly_fingerprint"
    override def nullSafeEval(t: Any): Any =
      Sketch.polyFingerprint(t.asInstanceOf[UTF8String])
    override protected def callExpr(c: String): String =
      s"graft.functions.Sketch.polyFingerprint($c)"
    override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
  }

  case class NfcNormalize(child: Expression) extends SketchUnary {
    override def dataType: DataType = org.apache.spark.sql.types.StringType
    override def prettyName: String = "nfc_normalize"
    override def nullSafeEval(t: Any): Any =
      UTF8String.fromString(java.text.Normalizer.normalize(
        t.asInstanceOf[UTF8String].toString, java.text.Normalizer.Form.NFC))
    override protected def callExpr(c: String): String =
      s"org.apache.spark.unsafe.types.UTF8String.fromString(" +
        s"java.text.Normalizer.normalize($c.toString(), java.text.Normalizer.Form.NFC))"
    override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
  }

  case class LshSig(child: Expression, planes: Int) extends SketchUnary {
    override def dataType: DataType = LongType
    override def prettyName: String = "vec_lsh_sig"
    override def nullSafeEval(t: Any): Any =
      Sketch.lshSig(t.asInstanceOf[ArrayData], planes)
    override protected def callExpr(c: String): String =
      s"graft.functions.Sketch.lshSig($c, $planes)"
    override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
  }

  /** Narrow membership probe against a broadcast Bloom filter of prior
    * content hashes — the zero-join leg of
    * [[graft.operators.Dedup.againstSnapshot]]. The broadcast handle
    * serializes as a small reference; executors read the (possibly
    * GB-scale) bit array from the block manager once per JVM and every
    * probe is a few cache-line reads. `mightContainLong` can return a
    * FALSE POSITIVE (rate = the filter's fpp) and never a false negative —
    * exactly the asymmetry snapshot dedup wants (a miss would readmit a
    * known duplicate; a rare FP drops one new document). */
  case class BloomMightContain(child: Expression,
      bc: org.apache.spark.broadcast.Broadcast[org.apache.spark.util.sketch.BloomFilter])
    extends UnaryExpression {
    override def dataType: DataType = org.apache.spark.sql.types.BooleanType
    override def prettyName: String = "bloom_might_contain"
    def contains(v: Long): Boolean = bc.value.mightContainLong(v)
    override def nullSafeEval(v: Any): Any = contains(v.asInstanceOf[Long])
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val ref = ctx.addReferenceObj("bloomProbe", this, classOf[BloomMightContain].getName)
      nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $ref.contains($c);")
    }
    override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
  }

  def bloom_might_contain(c: Column,
      bc: org.apache.spark.broadcast.Broadcast[org.apache.spark.util.sketch.BloomFilter]): Column =
    toCol(BloomMightContain(toExpr(c), bc))

  def word_shingles(text: Column, k: Int): Column = toCol(WordShingles(toExpr(text), k))
  def word_shingles_pos(text: Column, k: Int): Column =
    toCol(WordShinglesPos(toExpr(text), k))
  def minhash_sig(text: Column, k: Int, numHashes: Int): Column =
    toCol(MinHashSig(toExpr(text), k, numHashes))
  def simhash62(text: Column): Column = toCol(SimHash62(toExpr(text)))
  def poly_fingerprint(text: Column): Column = toCol(PolyFingerprint(toExpr(text)))
  def vec_lsh_sig(vec: Column, planes: Int): Column = toCol(LshSig(toExpr(vec), planes))
  def nfc_normalize(text: Column): Column = toCol(NfcNormalize(toExpr(text)))
}
