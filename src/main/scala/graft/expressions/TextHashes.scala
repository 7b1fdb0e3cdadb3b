package graft.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Static helpers for the native text-hash expressions. A Scala object
  * with no companion class compiles to static forwarder methods, so
  * generated Java can call `graft.expressions.Md5Fold.rollingFp(arr)`
  * directly inside whole-stage codegen.
  *
  * All values are md5-derived exactly like graft.functions.hash31
  * (first 15 hex chars of md5, base-16, mod 2^31-1) so results are
  * bit-identical to the HOF formulations and to the DuckDB oracles.
  */
object Md5Fold {
  val P: Long = 2147483647L

  private val digests =
    java.lang.ThreadLocal.withInitial[java.security.MessageDigest](() =>
      java.security.MessageDigest.getInstance("MD5"))

  /** hash60 of raw UTF-8 bytes: top 60 bits of the md5 digest
    * (= first 15 hex chars base-16 decoded) — the JVM mirror of
    * graft.functions.hash60. */
  def hash60(bytes: Array[Byte]): Long = {
    val md = digests.get()
    md.reset()
    val d = md.digest(bytes)
    var top = 0L
    var i = 0
    while (i < 8) { top = (top << 8) | (d(i) & 0xffL); i += 1 }
    top >>> 4
  }

  /** hash31 of raw UTF-8 bytes: [[hash60]] mod 2^31-1. */
  def hash31(bytes: Array[Byte]): Long = hash60(bytes) % P

  /** (hash60, hash60b) from ONE md5 digest — the JVM mirror of the
    * graft.functions.hash60/hash60b pair (hex digits 1-15 and 16-30
    * of the same digest): h1 = top 60 bits; h2 = the next 60 bits
    * (low nibble of byte 7, then bytes 8-14). The double-hashing
    * scheme's two hashes for one digest evaluation. */
  def hash60Pair(bytes: Array[Byte]): (Long, Long) = {
    val md = digests.get()
    md.reset()
    val d = md.digest(bytes)
    var top = 0L
    var i = 0
    while (i < 8) { top = (top << 8) | (d(i) & 0xffL); i += 1 }
    var b = (d(7) & 0xfL)
    i = 8
    while (i < 15) { b = (b << 8) | (d(i) & 0xffL); i += 1 }
    (top >>> 4, b)
  }

  /** Ordered polynomial fold over a token array:
    * acc = (acc*31 + hash31(tok)) mod P; empty array folds to 0.
    * Returns -1 when any element is null (the HOF fold nulls out) —
    * legal sentinel because every genuine value is in [0, P). */
  def rollingFp(arr: ArrayData): Long = {
    val n = arr.numElements()
    var acc = 0L
    var i = 0
    while (i < n) {
      if (arr.isNullAt(i)) return -1L
      acc = (acc * 31L + hash31(arr.getUTF8String(i).getBytes)) % P
      i += 1
    }
    acc
  }

  private val Space =
    org.apache.spark.unsafe.types.UTF8String.fromString(" ")

  /** Word n-gram shingles over a token array: space-joined windows of
    * n consecutive tokens, empty array when fewer than n tokens.
    * Null elements are skipped inside a window exactly like
    * array_join/concat_ws (the HOF formulation's behavior). */
  def shingleJoin(arr: ArrayData, n: Int): ArrayData = {
    val m = arr.numElements()
    if (m < n) return new GenericArrayData(new Array[Any](0))
    val toks =
      new Array[org.apache.spark.unsafe.types.UTF8String](m)
    var i = 0
    while (i < m) {
      toks(i) = if (arr.isNullAt(i)) null else arr.getUTF8String(i)
      i += 1
    }
    val out = new Array[Any](m - n + 1)
    i = 0
    while (i <= m - n) {
      out(i) = org.apache.spark.unsafe.types.UTF8String.concatWs(
        Space, java.util.Arrays.copyOfRange(toks, i, i + n): _*)
      i += 1
    }
    new GenericArrayData(out)
  }

  /** SimHash over a (distinct) token array in one pass: per bit i,
    * majority vote of bit i of each token's hash31 (+1/-1, ties set
    * the bit). An empty/all-null array yields 0 — matching the
    * explode+groupBy formulation where such docs produce no vote rows
    * and the join-back coalesces to 0. */
  def simHash(arr: ArrayData, bits: Int): Long = {
    val votes = new Array[Int](bits)
    val n = arr.numElements()
    var any = false
    var i = 0
    while (i < n) {
      if (!arr.isNullAt(i)) {
        any = true
        val h = hash31(arr.getUTF8String(i).getBytes)
        var j = 0
        while (j < bits) {
          if (((h >>> j) & 1L) == 1L) votes(j) += 1 else votes(j) -= 1
          j += 1
        }
      }
      i += 1
    }
    if (!any) return 0L
    var out = 0L
    var j = 0
    while (j < bits) {
      if (votes(j) >= 0) out |= 1L << j
      j += 1
    }
    out
  }

  /** Fused shingle+MinHash kernel: slide an n-token window over the
    * token array, feed each window's bytes (token, space, token, ...)
    * incrementally into the md5 — no shingle string is ever built —
    * and update all k permutation minima per window. Duplicate
    * shingles need no dedup: min over a multiset equals min over its
    * set, so the signature is identical to hashing distinct shingles
    * (the HOF/oracle formulation). Fewer than n tokens leaves
    * sig[i] = P; null tokens inside a window are skipped with their
    * separator, exactly like array_join. */
  def minHashText(arr: ArrayData, n: Int, a: Array[Long],
      b: Array[Long]): ArrayData = {
    val k = a.length
    val sig = new Array[Long](k)
    java.util.Arrays.fill(sig, P)
    val m = arr.numElements()
    if (m >= n) {
      val bytes = new Array[Array[Byte]](m)
      var i = 0
      while (i < m) {
        bytes(i) =
          if (arr.isNullAt(i)) null else arr.getUTF8String(i).getBytes
        i += 1
      }
      val md = digests.get()
      val space = ' '.toByte
      i = 0
      while (i <= m - n) {
        // a null token inside the window: array_join skips the token
        // AND its separator, so the shingle equals the join of the
        // non-null tokens — replicate by skipping
        md.reset()
        var first = true
        var j = i
        while (j < i + n) {
          if (bytes(j) != null) {
            if (!first) md.update(space)
            md.update(bytes(j))
            first = false
          }
          j += 1
        }
        val d = md.digest()
        var top = 0L
        var t = 0
        while (t < 8) { top = (top << 8) | (d(t) & 0xffL); t += 1 }
        val h = (top >>> 4) % P
        var p = 0
        while (p < k) {
          val v = (a(p) * h + b(p)) % P
          if (v < sig(p)) sig(p) = v
          p += 1
        }
        i += 1
      }
    }
    new GenericArrayData(sig)
  }

  /** POSITIONAL shingle hash60s: out(i) = hash60 of the space-joined
    * window starting at token i, in order, NO dedup — the kernel for
    * operators that need shingle positions (shared-span detection),
    * where [[shingleHashes]]'s per-doc-distinct TreeSet would lose
    * the diagonal structure. Window bytes feed the md5 incrementally;
    * no shingle string is materialized. Bit-identical to
    * hash60(space-joined shingle string) — null tokens skipped with
    * their separator like array_join. */
  def shinglePosHashes(arr: ArrayData, n: Int): ArrayData = {
    val m = arr.numElements()
    if (m < n) return new GenericArrayData(new Array[Any](0))
    val bytes = new Array[Array[Byte]](m)
    var i = 0
    while (i < m) {
      bytes(i) =
        if (arr.isNullAt(i)) null else arr.getUTF8String(i).getBytes
      i += 1
    }
    val md = digests.get()
    val space = ' '.toByte
    val out = new Array[Any](m - n + 1)
    i = 0
    while (i <= m - n) {
      md.reset()
      var first = true
      var j = i
      while (j < i + n) {
        if (bytes(j) != null) {
          if (!first) md.update(space)
          md.update(bytes(j))
          first = false
        }
        j += 1
      }
      val d = md.digest()
      var top = 0L
      var t = 0
      while (t < 8) { top = (top << 8) | (d(t) & 0xffL); t += 1 }
      out(i) = top >>> 4
      i += 1
    }
    new GenericArrayData(out)
  }

  /** DISTINCT, ascending-sorted hash31 values of the word n-gram
    * shingles of a token array — the decontamination / Jaccard
    * primitive as one narrow call: windows feed the md5 incrementally
    * (no shingle string is materialized), values dedup in a TreeSet,
    * so `explode` of the result is already per-document-distinct and
    * needs NO distinct shuffle downstream. Fewer than n tokens gives
    * an empty array; null tokens are skipped with their separator
    * like array_join. */
  def shingleHashes(arr: ArrayData, n: Int): ArrayData = {
    val m = arr.numElements()
    if (m < n) return new GenericArrayData(new Array[Any](0))
    val bytes = new Array[Array[Byte]](m)
    var i = 0
    while (i < m) {
      bytes(i) =
        if (arr.isNullAt(i)) null else arr.getUTF8String(i).getBytes
      i += 1
    }
    val md = digests.get()
    val space = ' '.toByte
    val set = new java.util.TreeSet[java.lang.Long]()
    i = 0
    while (i <= m - n) {
      md.reset()
      var first = true
      var j = i
      while (j < i + n) {
        if (bytes(j) != null) {
          if (!first) md.update(space)
          md.update(bytes(j))
          first = false
        }
        j += 1
      }
      val d = md.digest()
      var top = 0L
      var t = 0
      while (t < 8) { top = (top << 8) | (d(t) & 0xffL); t += 1 }
      set.add((top >>> 4) % P)
      i += 1
    }
    val out = new Array[Any](set.size)
    val it = set.iterator()
    i = 0
    while (it.hasNext) { out(i) = it.next().longValue(); i += 1 }
    new GenericArrayData(out)
  }

  /** Bloom-filter membership probe in ONE md5: h1 = md5 hex digits
    * 1-15 (top 60 bits), h2 = digits 16-30 (next 60) — exactly
    * functions.hash60 / hash60b — then the Kirsch-Mitzenmacher
    * positions (h1 + i*h2) mod bits for i < nHashes, tested against
    * the packed 32-bits-per-long word array. i*h2 < 2^62 for
    * nHashes <= 4, so the position arithmetic never overflows. */
  def bloomMember(s: org.apache.spark.unsafe.types.UTF8String,
      words: Array[Long], bits: Int, nHashes: Int): Boolean = {
    val md = digests.get()
    md.reset()
    val d = md.digest(s.getBytes)
    var top = 0L
    var i = 0
    while (i < 8) { top = (top << 8) | (d(i) & 0xffL); i += 1 }
    val h1 = top >>> 4
    var h2 = d(7) & 0xfL
    i = 8
    while (i < 15) { h2 = (h2 << 8) | (d(i) & 0xffL); i += 1 }
    i = 0
    while (i < nHashes) {
      val p = (h1 + i.toLong * h2) % bits
      if ((words((p >>> 5).toInt) & (1L << (p & 31L).toInt)) == 0L)
        return false
      i += 1
    }
    true
  }

  /** Full MinHash signature in one pass: hash each (distinct) shingle
    * once, then update all k per-permutation minima. Empty input gives
    * sig[i] = P (matches the HOF `when(size==0, P)` guard). Null
    * elements are skipped (array_min ignores the nulls the HOF
    * transform produces for them). */
  def minHashSig(arr: ArrayData, a: Array[Long], b: Array[Long]): ArrayData = {
    val k = a.length
    val sig = new Array[Long](k)
    java.util.Arrays.fill(sig, P)
    val n = arr.numElements()
    var any = false
    var i = 0
    while (i < n) {
      if (!arr.isNullAt(i)) {
        any = true
        val h = hash31(arr.getUTF8String(i).getBytes)
        var j = 0
        while (j < k) {
          val v = (a(j) * h + b(j)) % P
          if (v < sig(j)) sig(j) = v
          j += 1
        }
      }
      i += 1
    }
    if (!any) java.util.Arrays.fill(sig, P)
    new GenericArrayData(sig)
  }
}

/** Native `graft_rolling_fp(array<string>) -> long`: the rolling-hash
  * document fingerprint (graft.functions.rollingFingerprint) as ONE
  * codegen'd call per row. The HOF formulation
  * `aggregate(toks, 0, (acc,t) => (acc*31+hash31(t)) % P)` interprets
  * the lambda per element — an md5 through an interpreted expression
  * tree per token. This runs the identical fold in a tight JVM loop:
  * bit-identical output (oracle-checked by q_t_analyze), ~one order
  * of magnitude less per-row overhead on long documents. */
case class RollingFpArray(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"graft_rolling_fp requires array<string>, got $t")
  }

  override def dataType: DataType = LongType
  override def nullable: Boolean = true
  override def prettyName: String = "graft_rolling_fp"

  override protected def nullSafeEval(a: Any): Any = {
    val r = Md5Fold.rollingFp(a.asInstanceOf[ArrayData])
    if (r == -1L) null else r
  }

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val r = ctx.freshName("r")
      s"""
         |long $r = graft.expressions.Md5Fold.rollingFp($a);
         |if ($r == -1L) { ${ev.isNull} = true; }
         |else { ${ev.value} = $r; }
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression)
      : RollingFpArray = copy(child = newChild)
}

/** Native `graft_minhash_text(tokens, shingleSize, k) -> array<long>`:
  * the fully fused shingle+MinHash kernel (see Md5Fold.minHashText) —
  * one call per row from the token array to the signature, no shingle
  * array, no distinct pass, no per-shingle string allocation.
  * Bit-identical to `graft_minhash(array_distinct(graft_shingles(t,
  * n)), k)` (parity spec + unchanged oracle). */
case class MinHashTextExpr(first: Expression, second: Expression,
    third: Expression)
    extends org.apache.spark.sql.catalyst.expressions.TernaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (first.dataType, second.dataType, third.dataType) match {
      case (ArrayType(StringType, _), IntegerType, IntegerType)
        if second.foldable && third.foldable =>
        TypeCheckResult.TypeCheckSuccess
      case (a, b, c) => TypeCheckResult.TypeCheckFailure(
        "graft_minhash_text requires (array<string>, int literal, " +
          s"int literal), got ($a, $b, $c)")
    }

  private lazy val n: Int = second.eval().asInstanceOf[Int]
  private lazy val k: Int = third.eval().asInstanceOf[Int]
  private lazy val aConsts: Array[Long] =
    (0 until k).map(i =>
      Md5Fold.hash31(s"mh_a:$i".getBytes("UTF-8")) | 1L).toArray
  private lazy val bConsts: Array[Long] =
    (0 until k).map(i =>
      Md5Fold.hash31(s"mh_b:$i".getBytes("UTF-8"))).toArray

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = first.nullable
  override def prettyName: String = "graft_minhash_text"

  override protected def nullSafeEval(t: Any, nI: Any, kI: Any): Any =
    Md5Fold.minHashText(t.asInstanceOf[ArrayData], n, aConsts, bConsts)

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (t, _, _) => {
      val aRef = ctx.addReferenceObj("mhtA", aConsts, "long[]")
      val bRef = ctx.addReferenceObj("mhtB", bConsts, "long[]")
      s"${ev.value} = graft.expressions.Md5Fold.minHashText($t, $n, $aRef, $bRef);"
    })

  override protected def withNewChildrenInternal(newFirst: Expression,
      newSecond: Expression, newThird: Expression): MinHashTextExpr =
    copy(first = newFirst, second = newSecond, third = newThird)
}

/** Native `graft_shingles(array<string>, n) -> array<string>`: word
  * n-gram construction as one call per row. The HOF formulation
  * (`transform(sequence(...), i => array_join(slice(t, i+1, n)))`)
  * interprets three nested higher-order calls per shingle position;
  * this builds every window in a tight loop (parity-spec'd; feeds
  * minhash/jaccard/cluster/curation paths). `n` must be a foldable
  * integer literal. */
case class ShinglesExpr(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(StringType, _), IntegerType) if right.foldable =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"graft_shingles requires (array<string>, int literal), got ($l, $r)")
    }

  private lazy val n: Int = right.eval().asInstanceOf[Int]

  override def dataType: DataType = ArrayType(StringType,
    containsNull = false)
  override def nullable: Boolean = left.nullable
  override def prettyName: String = "graft_shingles"

  override protected def nullSafeEval(a: Any, nIgnored: Any): Any =
    Md5Fold.shingleJoin(a.asInstanceOf[ArrayData], n)

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, _) =>
      s"${ev.value} = graft.expressions.Md5Fold.shingleJoin($a, $n);")

  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): ShinglesExpr =
    copy(left = newLeft, right = newRight)
}

/** Native `graft_shingle_pos_hashes(array<string>, n) -> array<long>`:
  * ordered positional hash60s of every shingle window (see
  * [[Md5Fold.shinglePosHashes]]); `posexplode` of the result yields
  * (position, hash) directly — the shared-span path's kernel. */
case class ShinglePosHashesExpr(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(StringType, _), IntegerType) if right.foldable =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        "graft_shingle_pos_hashes requires (array<string>, int " +
          s"literal), got ($l, $r)")
    }

  private lazy val n: Int = right.eval().asInstanceOf[Int]

  override def dataType: DataType = ArrayType(LongType,
    containsNull = false)
  override def nullable: Boolean = left.nullable
  override def prettyName: String = "graft_shingle_pos_hashes"

  override protected def nullSafeEval(a: Any, nIgnored: Any): Any =
    Md5Fold.shinglePosHashes(a.asInstanceOf[ArrayData], n)

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, _) =>
      s"${ev.value} = graft.expressions.Md5Fold.shinglePosHashes($a, $n);")

  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): ShinglePosHashesExpr =
    copy(left = newLeft, right = newRight)
}

/** Native `graft_shingle_hashes(array<string>, n) -> array<long>`:
  * distinct sorted hash31 values of the word n-gram shingles, one
  * narrow call per row. Exploding the result gives per-doc-distinct
  * (id, hash) rows directly — the alternative relational shape
  * (explode shingle strings → md5-hash → dropDuplicates) pays an
  * interpreted HOF pass AND a full-corpus distinct shuffle for the
  * same rows. Feeds decontamination. `n` must be a foldable integer
  * literal. */
case class ShingleHashesExpr(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(StringType, _), IntegerType) if right.foldable =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        "graft_shingle_hashes requires (array<string>, int literal), " +
          s"got ($l, $r)")
    }

  private lazy val n: Int = right.eval().asInstanceOf[Int]

  override def dataType: DataType = ArrayType(LongType,
    containsNull = false)
  override def nullable: Boolean = left.nullable
  override def prettyName: String = "graft_shingle_hashes"

  override protected def nullSafeEval(a: Any, nIgnored: Any): Any =
    Md5Fold.shingleHashes(a.asInstanceOf[ArrayData], n)

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, _) =>
      s"${ev.value} = graft.expressions.Md5Fold.shingleHashes($a, $n);")

  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): ShingleHashesExpr =
    copy(left = newLeft, right = newRight)
}

/** Native `graft_simhash(array<string>, bits) -> long`: the whole
  * SimHash fingerprint as ONE narrow per-row call. The relational
  * formulation (explode tokens → groupBy(id) with `bits` conditional
  * sums → join back) pays two shuffles for what is a pure per-row
  * computation; this removes both (oracle-checked by q_d_simhash,
  * parity-spec'd against the groupBy shape). `bits` must be a
  * foldable integer literal <= 32. */
case class SimHashExpr(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(StringType, _), IntegerType) if right.foldable =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"graft_simhash requires (array<string>, int literal), got ($l, $r)")
    }

  private lazy val bits: Int = right.eval().asInstanceOf[Int]

  override def dataType: DataType = LongType
  override def nullable: Boolean = left.nullable
  override def prettyName: String = "graft_simhash"

  override protected def nullSafeEval(a: Any, bIgnored: Any): Any =
    Md5Fold.simHash(a.asInstanceOf[ArrayData], bits)

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, _) =>
      s"${ev.value} = graft.expressions.Md5Fold.simHash($a, $bits);")

  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): SimHashExpr =
    copy(left = newLeft, right = newRight)
}

/** Native `graft_minhash(array<string>, k) -> array<long>`: the whole
  * MinHash signature in one call per row. Permutation constants are
  * derived from the SAME md5 seeds as Dedup.minHashA/minHashB, so the
  * signature is bit-identical to the HOF formulation (oracle-checked
  * by q_d_minhash_sig). `k` must be a foldable integer literal. */
case class MinHashSigExpr(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(StringType, _), IntegerType) if right.foldable =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"graft_minhash requires (array<string>, int literal), got ($l, $r)")
    }

  private lazy val k: Int = right.eval().asInstanceOf[Int]
  private lazy val aConsts: Array[Long] =
    (0 until k).map(i => seedHash(s"mh_a:$i") | 1L).toArray
  private lazy val bConsts: Array[Long] =
    (0 until k).map(i => seedHash(s"mh_b:$i")).toArray

  private def seedHash(s: String): Long =
    Md5Fold.hash31(s.getBytes("UTF-8"))

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = left.nullable
  override def prettyName: String = "graft_minhash"

  override protected def nullSafeEval(a: Any, kIgnored: Any): Any =
    Md5Fold.minHashSig(a.asInstanceOf[ArrayData], aConsts, bConsts)

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, _) => {
      val aRef = ctx.addReferenceObj("mhA", aConsts, "long[]")
      val bRef = ctx.addReferenceObj("mhB", bConsts, "long[]")
      s"${ev.value} = graft.expressions.Md5Fold.minHashSig($a, $aRef, $bRef);"
    })

  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): MinHashSigExpr =
    copy(left = newLeft, right = newRight)
}

/** Native `graft_bloom_member(string, array<long> literal, bits,
  * nHashes) -> boolean`: the whole bloom membership probe as ONE
  * codegen'd call — one md5, both 60-bit halves, all
  * Kirsch-Mitzenmacher positions tested in a tight loop against the
  * collected word array (a reference object in the generated class,
  * the value a real cluster broadcasts). The column formulation
  * re-evaluates the md5→conv chain per probe conjunct on every fact
  * row — this is the scan-side hot path of bloomPreJoin, so per-row
  * cost is the whole ballgame. Bit-identical to the hash60/hash60b
  * positions (oracle: q_j13_bloom_join's plain-join SQL). */
case class BloomMemberExpr(first: Expression, second: Expression,
    third: Expression, fourth: Expression)
    extends org.apache.spark.sql.catalyst.expressions.QuaternaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (first.dataType, second.dataType, third.dataType,
      fourth.dataType) match {
      case (StringType, ArrayType(LongType, _), IntegerType, IntegerType)
        if second.foldable && third.foldable && fourth.foldable =>
        TypeCheckResult.TypeCheckSuccess
      case (a, b, c, d) => TypeCheckResult.TypeCheckFailure(
        "graft_bloom_member requires (string, array<long> literal, " +
          s"int literal, int literal), got ($a, $b, $c, $d)")
    }

  private lazy val words: Array[Long] = {
    val arr = second.eval().asInstanceOf[ArrayData]
    arr.toLongArray()
  }
  private lazy val bits: Int = third.eval().asInstanceOf[Int]
  private lazy val nHashes: Int = fourth.eval().asInstanceOf[Int]

  override def dataType: DataType = BooleanType
  override def nullable: Boolean = first.nullable
  override def prettyName: String = "graft_bloom_member"

  override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any = {
    val s = first.eval(input)
    if (s == null) null
    else Md5Fold.bloomMember(
      s.asInstanceOf[org.apache.spark.unsafe.types.UTF8String],
      words, bits, nHashes)
  }

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode = {
    val wRef = ctx.addReferenceObj("bloomWords", words, "long[]")
    val c = first.genCode(ctx)
    val code =
      code"""
        |${c.code}
        |boolean ${ev.isNull} = ${c.isNull};
        |boolean ${ev.value} = false;
        |if (!${ev.isNull}) {
        |  ${ev.value} = graft.expressions.Md5Fold.bloomMember(
        |    ${c.value}, $wRef, $bits, $nHashes);
        |}
       """.stripMargin
    ev.copy(code = code)
  }

  override protected def withNewChildrenInternal(newFirst: Expression,
      newSecond: Expression, newThird: Expression,
      newFourth: Expression): BloomMemberExpr =
    copy(first = newFirst, second = newSecond, third = newThird,
      fourth = newFourth)
}

/** Static helper for [[BpeApplyExpr]]: apply an ordered BPE merge
  * table to a token array and return the flattened encoded symbol
  * stream. Semantics are EXACTLY the spaced-string replace chain of
  * the HOF formulation (TextAnalysis.bpeEncodeHof and the DuckDB
  * oracle): per merge, one left-to-right non-overlapping pass over
  * each token's symbol list, and a symbol produced by a merge never
  * re-matches within the same pass (String.replace resumes after the
  * replacement). Characters are split by CODE POINT, matching the
  * HOF's substr(i, 1). */
object BpeKernel {
  import org.apache.spark.unsafe.types.UTF8String

  def encode(toks: ArrayData, merges: ArrayData): ArrayData = {
    val nm = merges.numElements()
    val lhs = new Array[String](nm)
    val rhs = new Array[String](nm)
    var m = 0
    while (m < nm) {
      val pair = merges.getArray(m)
      lhs(m) = pair.getUTF8String(0).toString
      rhs(m) = pair.getUTF8String(1).toString
      m += 1
    }
    val out = scala.collection.mutable.ArrayBuffer.empty[Any]
    val nt = toks.numElements()
    var i = 0
    while (i < nt) {
      if (!toks.isNullAt(i)) {
        val w = toks.getUTF8String(i).toString
        var syms = new java.util.ArrayList[String]()
        var ci = 0
        while (ci < w.length) {
          val n = Character.charCount(w.codePointAt(ci))
          syms.add(w.substring(ci, ci + n))
          ci += n
        }
        m = 0
        while (m < nm) {
          val l = lhs(m); val r = rhs(m)
          val merged = new java.util.ArrayList[String](syms.size)
          var j = 0
          while (j < syms.size) {
            if (j + 1 < syms.size && syms.get(j) == l &&
                syms.get(j + 1) == r) {
              merged.add(l + r); j += 2
            } else {
              merged.add(syms.get(j)); j += 1
            }
          }
          syms = merged
          m += 1
        }
        var k = 0
        while (k < syms.size) {
          out += UTF8String.fromString(syms.get(k))
          k += 1
        }
      }
      i += 1
    }
    new GenericArrayData(out.toArray)
  }
}

/** Native `graft_bpe(array<string>, array<array<string>>) ->
  * array<string>`: encode a token array against a rank-ordered BPE
  * merge table ([lhs, rhs] pairs) in one tight loop per row. The HOF
  * shape rebuilt a spaced string per token and ran one interpreted
  * `replace` per (token, merge) — this kernel walks symbol lists
  * directly (parity-spec'd in TextOpsSpec, oracle-checked by
  * q_t_bpe_encode). The merge table arrives as a broadcast column,
  * so encoding a 100 TB corpus stays a zero-shuffle narrow map. */
case class BpeApplyExpr(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(StringType, _),
          ArrayType(ArrayType(StringType, _), _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"graft_bpe requires (array<string>, array<array<string>>), " +
          s"got ($l, $r)")
    }

  override def dataType: DataType = ArrayType(StringType,
    containsNull = false)
  override def nullable: Boolean = left.nullable || right.nullable
  override def prettyName: String = "graft_bpe"

  override protected def nullSafeEval(a: Any, b: Any): Any =
    BpeKernel.encode(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.expressions.BpeKernel.encode($a, $b);")

  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): BpeApplyExpr =
    copy(left = newLeft, right = newRight)
}
