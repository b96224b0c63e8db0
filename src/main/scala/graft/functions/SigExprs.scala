package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Static kernels the generated code calls into — one virtual-free call
  * per row, no UDF SerDe (a Scala UDF converts the whole row through
  * Catalyst↔Scala encoders; these take the unsafe representations
  * directly). Top-level object methods compile to static forwarders, so
  * janino-generated Java can call them by name.
  */
object SigKernels {

  /** MinHash signature of a document text, or null when the text has no
    * word-trigram shingles (< 3 tokens) — the row is then filtered out,
    * matching the SQL pipeline's `WHERE len(t) >= 3`.
    */
  def minhashSigOrNull(text: UTF8String): ArrayData = {
    val t = text.toString.toLowerCase(java.util.Locale.ROOT)
      .split("\\s+").filter(_.nonEmpty)
    if (t.length < 3) return null
    val sig = Array.fill(Hashing.MinhashK)(Hashing.ModP)
    val seen = new java.util.HashSet[String]()
    var i = 0
    while (i <= t.length - 3) {
      val sh = t(i) + " " + t(i + 1) + " " + t(i + 2)
      if (seen.add(sh)) {
        val x = Hashing.md5_60(sh) % Hashing.ModP
        var k = 0
        while (k < Hashing.MinhashK) {
          val h = (Hashing.minhashA60(k) * x + Hashing.minhashB60(k)) % Hashing.ModP
          if (h < sig(k)) sig(k) = h
          k += 1
        }
      }
      i += 1
    }
    ArrayData.toArrayData(sig)
  }

  /** 60-bit SimHash of a document text, or null when the text has no
    * tokens (simhash(∅) = 0 would make every empty doc a hamming-0
    * "duplicate" of every other).
    */
  def simhashSigOrNull(text: UTF8String): java.lang.Long = {
    val toks = text.toString.toLowerCase(java.util.Locale.ROOT)
      .split("\\s+").filter(_.nonEmpty)
    if (toks.isEmpty) return null
    val freq = new java.util.HashMap[java.lang.Long, Int]()
    var i = 0
    while (i < toks.length) {
      freq.merge(Hashing.md5_60(toks(i)), 1, (a, b) => a + b)
      i += 1
    }
    val acc = new Array[Int](60)
    val it = freq.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      val h = e.getKey.longValue()
      val w = e.getValue
      var b = 0
      while (b < 60) {
        if (((h >>> b) & 1L) == 1L) acc(b) += w else acc(b) -= w
        b += 1
      }
    }
    var out = 0L
    var b = 0
    while (b < 60) {
      if (acc(b) > 0) out |= (1L << b)
      b += 1
    }
    java.lang.Long.valueOf(out)
  }
}

/** Native codegen'd multi-table random-hyperplane LSH signatures: for a
  * float vector, the per-table sign-bit signature against `nTables ×
  * planesPerTable` hyperplanes (flattened row-major into `planes`, each
  * plane `dim` doubles). Output: ARRAY<INT> of `nTables` signatures.
  * Replaces the Scala UDF of round 2 — the dot products now run inside
  * WholeStageCodegen over the unsafe float array, no per-row Seq[Float]
  * materialization.
  */
case class HyperplaneSigs(child: Expression, planes: Seq[Double],
    nTables: Int, planesPerTable: Int, dim: Int)
    extends UnaryExpression {

  // `planes` is a Seq, NOT Array: case-class equality over an Array is
  // reference identity, so two structurally identical expressions would
  // never compare semanticEqual — defeating subexpression elimination
  // and plan canonicalization. The hot loops index the unwrapped array.
  @transient private lazy val planesArr: Array[Double] = planes.toArray

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def nullable: Boolean = child.nullable

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"hyperplane_sigs requires ARRAY<FLOAT>, got ${t.catalogString}")
  }

  private def compute(emb: ArrayData): ArrayData = {
    val planes = planesArr
    val n = emb.numElements()
    val sigs = new Array[Int](nTables)
    var t = 0
    while (t < nTables) {
      var sig = 0
      var b = 0
      while (b < planesPerTable) {
        val off = (t * planesPerTable + b) * dim
        val lim = math.min(dim, n)
        var dot = 0.0
        var i = 0
        while (i < lim) { dot += emb.getFloat(i) * planes(off + i); i += 1 }
        if (dot > 0) sig |= (1 << b)
        b += 1
      }
      sigs(t) = sig
      t += 1
    }
    ArrayData.toArrayData(sigs)
  }

  override def nullSafeEval(input: Any): Any =
    compute(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val pl = ctx.addReferenceObj("planes", planesArr, "double[]")
    nullSafeCodeGen(ctx, ev, emb => {
      val n = ctx.freshName("n")
      val sigs = ctx.freshName("sigs")
      val t = ctx.freshName("t")
      val b = ctx.freshName("b")
      val i = ctx.freshName("i")
      val off = ctx.freshName("off")
      val lim = ctx.freshName("lim")
      val dot = ctx.freshName("dot")
      val sig = ctx.freshName("sig")
      s"""
         |final int $n = $emb.numElements();
         |final int[] $sigs = new int[$nTables];
         |final int $lim = Math.min($dim, $n);
         |for (int $t = 0; $t < $nTables; $t++) {
         |  int $sig = 0;
         |  for (int $b = 0; $b < $planesPerTable; $b++) {
         |    final int $off = ($t * $planesPerTable + $b) * $dim;
         |    double $dot = 0.0;
         |    for (int $i = 0; $i < $lim; $i++) {
         |      $dot += (double) $emb.getFloat($i) * $pl[$off + $i];
         |    }
         |    if ($dot > 0) $sig |= (1 << $b);
         |  }
         |  $sigs[$t] = $sig;
         |}
         |${ev.value} = org.apache.spark.sql.catalyst.util.ArrayData.toArrayData($sigs);
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): HyperplaneSigs =
    copy(child = newChild)

  override def prettyName: String = "hyperplane_sigs"
}

object HyperplaneSigs {
  import org.apache.spark.sql.graft.ColumnBridge

  /** `planes` as produced by `Similarity.hyperplanes` (nTables ×
    * planesPerTable rows of `dim` doubles), flattened for the codegen
    * kernel.
    */
  def sigs(emb: Column, planes: Array[Array[Double]], nTables: Int,
      planesPerTable: Int): Column = {
    val dim = planes.head.length
    ColumnBridge.column(HyperplaneSigs(ColumnBridge.expression(emb),
      scala.collection.immutable.ArraySeq.unsafeWrapArray(planes.flatten),
      nTables, planesPerTable, dim))
  }
}

/** Native product-quantization encoder: for a float vector split into
  * `nBlocks` contiguous subvectors of `blockDim` dims, the index of the
  * nearest codebook centroid per block (L2, ties to the lowest id —
  * matching a `row_number() ORDER BY d, cid` restatement). Codebooks are
  * flattened row-major: `codebooks[((b * k) + c) * blockDim + i]`.
  * Output ARRAY<INT> of `nBlocks` codes, computed inside
  * WholeStageCodegen.
  */
case class PqEncode(child: Expression, codebooks: Seq[Double],
    nBlocks: Int, k: Int, blockDim: Int)
    extends UnaryExpression {

  // Seq, not Array, for structural case-class equality (see
  // [[HyperplaneSigs]]); hot loops index the unwrapped array
  @transient private lazy val codebooksArr: Array[Double] = codebooks.toArray

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def nullable: Boolean = child.nullable

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"pq_encode requires ARRAY<FLOAT>, got ${t.catalogString}")
  }

  override def nullSafeEval(input: Any): Any = {
    val codebooks = codebooksArr
    val emb = input.asInstanceOf[ArrayData]
    val n = emb.numElements()
    val codes = new Array[Int](nBlocks)
    var b = 0
    while (b < nBlocks) {
      var best = 0
      var bestD = Double.MaxValue
      var c = 0
      while (c < k) {
        val off = (b * k + c) * blockDim
        var d = 0.0
        var i = 0
        while (i < blockDim) {
          val idx = b * blockDim + i
          val v = if (idx < n) emb.getFloat(idx).toDouble else 0.0
          val diff = v - codebooks(off + i)
          d += diff * diff
          i += 1
        }
        if (d < bestD) { bestD = d; best = c }
        c += 1
      }
      codes(b) = best
      b += 1
    }
    ArrayData.toArrayData(codes)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cb = ctx.addReferenceObj("codebooks", codebooksArr, "double[]")
    nullSafeCodeGen(ctx, ev, emb => {
      val n = ctx.freshName("n")
      val codes = ctx.freshName("codes")
      val b = ctx.freshName("b")
      val c = ctx.freshName("c")
      val i = ctx.freshName("i")
      val idx = ctx.freshName("idx")
      val off = ctx.freshName("off")
      val best = ctx.freshName("best")
      val bestD = ctx.freshName("bestD")
      val d = ctx.freshName("d")
      val v = ctx.freshName("v")
      val diff = ctx.freshName("diff")
      s"""
         |final int $n = $emb.numElements();
         |final int[] $codes = new int[$nBlocks];
         |for (int $b = 0; $b < $nBlocks; $b++) {
         |  int $best = 0;
         |  double $bestD = Double.MAX_VALUE;
         |  for (int $c = 0; $c < $k; $c++) {
         |    final int $off = ($b * $k + $c) * $blockDim;
         |    double $d = 0.0;
         |    for (int $i = 0; $i < $blockDim; $i++) {
         |      final int $idx = $b * $blockDim + $i;
         |      final double $v = $idx < $n ? (double) $emb.getFloat($idx) : 0.0;
         |      final double $diff = $v - $cb[$off + $i];
         |      $d += $diff * $diff;
         |    }
         |    if ($d < $bestD) { $bestD = $d; $best = $c; }
         |  }
         |  $codes[$b] = $best;
         |}
         |${ev.value} = org.apache.spark.sql.catalyst.util.ArrayData.toArrayData($codes);
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): PqEncode =
    copy(child = newChild)

  override def prettyName: String = "pq_encode"
}

object PqEncode {
  import org.apache.spark.sql.graft.ColumnBridge

  /** `codebooks(b)(c)` is the `blockDim`-dim centroid c of block b. */
  def pq_encode(emb: Column, codebooks: Array[Array[Array[Double]]]): Column = {
    val nBlocks = codebooks.length
    val k = codebooks.head.length
    val blockDim = codebooks.head.head.length
    ColumnBridge.column(PqEncode(ColumnBridge.expression(emb),
      scala.collection.immutable.ArraySeq.unsafeWrapArray(codebooks.flatten.flatten),
      nBlocks, k, blockDim))
  }
}

/** Native MinHash-signature expression (ARRAY<BIGINT>, null for
  * shingle-less docs). The shingling + 64-permutation fold runs as one
  * static kernel call per row inside WholeStageCodegen — replaces the
  * round-2 typed `.map` (which broke codegen with an object
  * serialize/deserialize boundary).
  */
case class MinHashSigExpr(child: Expression) extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"minhash_sig requires STRING, got ${t.catalogString}")
  }

  override def nullSafeEval(input: Any): Any =
    SigKernels.minhashSigOrNull(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, text => {
      val r = ctx.freshName("r")
      s"""
         |org.apache.spark.sql.catalyst.util.ArrayData $r =
         |  graft.functions.SigKernels.minhashSigOrNull($text);
         |if ($r == null) { ${ev.isNull} = true; } else { ${ev.value} = $r; }
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): MinHashSigExpr =
    copy(child = newChild)

  override def prettyName: String = "minhash_sig"
}

object MinHashSigExpr {
  import org.apache.spark.sql.graft.ColumnBridge
  def minhash_sig(text: Column): Column =
    ColumnBridge.column(MinHashSigExpr(ColumnBridge.expression(text)))
}

/** Native 60-bit SimHash expression (BIGINT, null for token-less docs) —
  * same static-kernel-in-codegen shape as [[MinHashSigExpr]].
  */
case class SimHashSigExpr(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"simhash_sig requires STRING, got ${t.catalogString}")
  }

  override def nullSafeEval(input: Any): Any = {
    val r = SigKernels.simhashSigOrNull(input.asInstanceOf[UTF8String])
    if (r == null) null else r.longValue()
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, text => {
      val r = ctx.freshName("r")
      s"""
         |java.lang.Long $r = graft.functions.SigKernels.simhashSigOrNull($text);
         |if ($r == null) { ${ev.isNull} = true; } else { ${ev.value} = $r.longValue(); }
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): SimHashSigExpr =
    copy(child = newChild)

  override def prettyName: String = "simhash_sig"
}

object SimHashSigExpr {
  import org.apache.spark.sql.graft.ColumnBridge
  def simhash_sig(text: Column): Column =
    ColumnBridge.column(SimHashSigExpr(ColumnBridge.expression(text)))
}
