package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.graftbridge.{ColumnBridge, TypeBridge}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, CodegenFallback, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expressions for the hot hashing paths.
  *
  * The higher-order-function formulations in [[TextFunctions]]
  * (`transform(shingles, t -> aggregate(split(t,''), …))`) are exact
  * and oracle-checkable but interpret one lambda call per character —
  * the dominant cost of the dedup queries. These expressions compute
  * the *identical values* (same 31-base polynomial mod 1e9+7, same
  * distinct-set semantics) in a single tight JVM loop per row:
  * O(len) rolling-window shingle hashing and a one-pass k-minima
  * minhash — ~10× less work and no intermediate string arrays.
  *
  * Exactness contract: for ASCII text (all testdata documents are —
  * verified) `charAt` equals the codepoint, so values match the
  * `ascii()`/`unicode()` based oracle bit-for-bit. Non-BMP input would
  * differ (UTF-16 units vs codepoints); acceptable for hash purposes,
  * documented here.
  */
object HashExpressions {

  final val P = 1000000007L

  /** Distinct rolling n-gram polynomial hashes of a string.
    *
    * Codegen note (applies to every loop-heavy unary expression here):
    * instead of CodegenFallback — which materializes the WHOLE input
    * row into an InternalRow per call just to re-extract one column —
    * `doGenCode` registers this instance as a reference object and
    * emits a direct `nullSafeEval(column)` call, so only the needed
    * value crosses the generated-code boundary and the enclosing
    * WholeStageCodegen stage stays intact. */
  case class ShingleHashes(child: Expression, n: Int)
      extends UnaryExpression with ExpectsInputTypes {
    override def inputTypes: Seq[TypeBridge.AbstractType] = Seq(StringType)

    override def dataType: DataType = ArrayType(LongType, containsNull = false)
    override def prettyName: String = "shingle_hashes"

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val ref = ctx.addReferenceObj("shingleExpr", this,
        classOf[ShingleHashes].getName)
      defineCodeGen(ctx, ev, c =>
        s"(org.apache.spark.sql.catalyst.util.ArrayData) $ref.nullSafeEval($c)")
    }

    override def nullSafeEval(input: Any): Any = {
      val s = input.asInstanceOf[UTF8String].toString
      val len = s.length
      if (len < n) return new GenericArrayData(Array.empty[Long])
      // 31^(n-1) mod P for the sliding-window update
      var pow = 1L
      var i = 1
      while (i < n) { pow = pow * 31 % P; i += 1 }
      val seen = new java.util.LinkedHashSet[java.lang.Long]()
      // first window: plain fold
      var h = 0L
      i = 0
      while (i < n) { h = (h * 31 + s.charAt(i)) % P; i += 1 }
      seen.add(h)
      // slide: drop leading char, append next
      i = n
      while (i < len) {
        val out = s.charAt(i - n) * pow % P
        h = ((h - out + P) % P * 31 + s.charAt(i)) % P
        seen.add(h)
        i += 1
      }
      val arr = new Array[Long](seen.size)
      val it = seen.iterator()
      var j = 0
      while (it.hasNext) { arr(j) = it.next(); j += 1 }
      // sorted output: downstream set ops (jaccard) become linear
      // merge scans ([[SortedJaccard]]); min/jaccard semantics are
      // order-free so the oracle is unaffected
      java.util.Arrays.sort(arr)
      new GenericArrayData(arr)
    }

    override protected def withNewChildInternal(c: Expression): ShingleHashes =
      copy(child = c)
  }

  /** Jaccard similarity |a∩b| / |a∪b| of two SORTED distinct long
    * arrays via a primitive merge scan — the verify step of the dedup
    * joins. Replaces `array_intersect` (per-row hash-set build, boxed
    * access: ~10 s for 230 k candidate pairs at sf0.1 → ~1 s).
    * Participates in whole-stage codegen (no fallback row-by-row
    * eval boundary in the verify join's generated loop). */
  case class SortedJaccard(left: Expression, right: Expression)
      extends BinaryExpression with ExpectsInputTypes {
    override def inputTypes: Seq[TypeBridge.AbstractType] = Seq(ArrayType(LongType), ArrayType(LongType))

    override def dataType: DataType = DoubleType
    override def prettyName: String = "sorted_jaccard"

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, (a, b) => {
        val na = ctx.freshName("na"); val nb = ctx.freshName("nb")
        val i = ctx.freshName("i"); val j = ctx.freshName("j")
        val inter = ctx.freshName("inter"); val uni = ctx.freshName("uni")
        val x = ctx.freshName("x"); val y = ctx.freshName("y")
        s"""
           |int $na = $a.numElements();
           |int $nb = $b.numElements();
           |int $i = 0; int $j = 0; int $inter = 0;
           |while ($i < $na && $j < $nb) {
           |  long $x = $a.getLong($i);
           |  long $y = $b.getLong($j);
           |  if ($x == $y) { $inter++; $i++; $j++; }
           |  else if ($x < $y) { $i++; } else { $j++; }
           |}
           |int $uni = $na + $nb - $inter;
           |${ev.value} = ($uni == 0) ? 0.0 : ((double) $inter) / ((double) $uni);
         """.stripMargin
      })

    override def nullSafeEval(l: Any, r: Any): Any = {
      val a = l.asInstanceOf[ArrayData]
      val b = r.asInstanceOf[ArrayData]
      val na = a.numElements()
      val nb = b.numElements()
      var i = 0
      var j = 0
      var inter = 0
      while (i < na && j < nb) {
        val x = a.getLong(i)
        val y = b.getLong(j)
        if (x == y) { inter += 1; i += 1; j += 1 }
        else if (x < y) i += 1
        else j += 1
      }
      val uni = na + nb - inter
      java.lang.Double.valueOf(
        if (uni == 0) 0.0 else inter.toDouble / uni.toDouble)
    }

    override protected def withNewChildrenInternal(
        newLeft: Expression, newRight: Expression): SortedJaccard =
      copy(left = newLeft, right = newRight)
  }

  /** [[SortedJaccard]] with EARLY ABANDON below a fixed threshold — the
    * verify step of every candidate-pair join, where the overwhelming
    * majority of candidates are NON-duplicates whose merge scans run to
    * the end only to be filtered out. Same bound arithmetic as the
    * tiled kernels' `jaccardOrBelow` (pinned q20≡q82 / q21≡q86): a
    * size-ratio prefilter (jac ≤ |min|/|max|) plus an every-64-steps
    * optimistic bound ((inter + rem) / (na + nb − inter − rem) with
    * rem = min remaining — the best the pair can still reach). When
    * the bound proves jac < t the expression returns −1.0, which the
    * caller's `jac ≥ t` filter drops exactly as it would have dropped
    * the true value; when the pair qualifies the loop never abandons
    * and the result is bit-identical to [[SortedJaccard]]. Only valid
    * under a downstream `jac ≥ t` filter with the SAME t — never let
    * the −1.0 escape into query output. */
  case class SortedJaccardGeq(left: Expression, right: Expression,
      threshold: Double)
      extends BinaryExpression with ExpectsInputTypes {
    override def inputTypes: Seq[TypeBridge.AbstractType] = Seq(ArrayType(LongType), ArrayType(LongType))

    override def dataType: DataType = DoubleType
    override def prettyName: String = "sorted_jaccard_geq"

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, (a, b) => {
        val na = ctx.freshName("na"); val nb = ctx.freshName("nb")
        val i = ctx.freshName("i"); val j = ctx.freshName("j")
        val inter = ctx.freshName("inter"); val uni = ctx.freshName("uni")
        val x = ctx.freshName("x"); val y = ctx.freshName("y")
        val mn = ctx.freshName("mn"); val mx = ctx.freshName("mx")
        val steps = ctx.freshName("steps"); val rem = ctx.freshName("rem")
        val done = ctx.freshName("done")
        s"""
           |int $na = $a.numElements();
           |int $nb = $b.numElements();
           |int $mn = ($na < $nb) ? $na : $nb;
           |int $mx = ($na < $nb) ? $nb : $na;
           |boolean $done = false;
           |${ev.value} = -1.0;
           |if ($mx > 0 && ((double) $mn) / ((double) $mx) < $threshold) {
           |  $done = true;
           |}
           |int $i = 0; int $j = 0; int $inter = 0; int $steps = 0;
           |while (!$done && $i < $na && $j < $nb) {
           |  long $x = $a.getLong($i);
           |  long $y = $b.getLong($j);
           |  if ($x == $y) { $inter++; $i++; $j++; }
           |  else if ($x < $y) { $i++; } else { $j++; }
           |  $steps++;
           |  if (($steps & 63) == 0) {
           |    int $rem = ($na - $i < $nb - $j) ? ($na - $i) : ($nb - $j);
           |    if (((double) ($inter + $rem)) /
           |        ((double) ($na + $nb - $inter - $rem)) < $threshold) {
           |      $done = true;
           |    }
           |  }
           |}
           |if (!$done) {
           |  int $uni = $na + $nb - $inter;
           |  ${ev.value} = ($uni == 0) ? 0.0 : ((double) $inter) / ((double) $uni);
           |}
         """.stripMargin
      })

    override def nullSafeEval(l: Any, r: Any): Any = {
      val a = l.asInstanceOf[ArrayData]
      val b = r.asInstanceOf[ArrayData]
      val na = a.numElements()
      val nb = b.numElements()
      val mn = math.min(na, nb)
      val mx = math.max(na, nb)
      if (mx > 0 && mn.toDouble / mx.toDouble < threshold)
        return java.lang.Double.valueOf(-1.0)
      var i = 0
      var j = 0
      var inter = 0
      var steps = 0
      while (i < na && j < nb) {
        val x = a.getLong(i)
        val y = b.getLong(j)
        if (x == y) { inter += 1; i += 1; j += 1 }
        else if (x < y) i += 1
        else j += 1
        steps += 1
        if ((steps & 63) == 0) {
          val rem = math.min(na - i, nb - j)
          if ((inter + rem).toDouble / (na + nb - inter - rem).toDouble
              < threshold)
            return java.lang.Double.valueOf(-1.0)
        }
      }
      val uni = na + nb - inter
      java.lang.Double.valueOf(
        if (uni == 0) 0.0 else inter.toDouble / uni.toDouble)
    }

    override protected def withNewChildrenInternal(
        newLeft: Expression, newRight: Expression): SortedJaccardGeq =
      copy(left = newLeft, right = newRight)
  }

  /** k-minima minhash signature over a long-array column in one pass
    * (same (A·h+B) mod P permutation family as
    * [[TextFunctions.minHashSignature]]; empty input → P sentinels). */
  case class MinHashSig(child: Expression)
      extends UnaryExpression with ExpectsInputTypes {
    override def inputTypes: Seq[TypeBridge.AbstractType] = Seq(ArrayType(LongType))

    private val A = TextFunctions.MinHashA.toArray
    private val B = TextFunctions.MinHashB.toArray
    override def dataType: DataType = ArrayType(LongType, containsNull = false)
    override def prettyName: String = "minhash_sig"

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val ref = ctx.addReferenceObj("minHashExpr", this,
        classOf[MinHashSig].getName)
      defineCodeGen(ctx, ev, c =>
        s"(org.apache.spark.sql.catalyst.util.ArrayData) $ref.nullSafeEval($c)")
    }

    override def nullSafeEval(input: Any): Any = {
      val hashes = input.asInstanceOf[ArrayData]
      val k = A.length
      val mins = Array.fill(k)(P)
      val m = hashes.numElements()
      var i = 0
      while (i < m) {
        val h = hashes.getLong(i)
        var j = 0
        while (j < k) {
          val v = (A(j) * h + B(j)) % P
          if (v < mins(j)) mins(j) = v
          j += 1
        }
        i += 1
      }
      new GenericArrayData(mins)
    }

    override protected def withNewChildInternal(c: Expression): MinHashSig =
      copy(child = c)
  }

  /** Sequential left-fold double dot product of two float/double
    * arrays — bit-identical to the `aggregate(zip_with(...))`
    * formulation (same accumulation order) and to the oracle's
    * `list_reduce`, but a primitive loop instead of per-element
    * lambda interpretation. Participates in whole-stage codegen: the
    * ANN re-rank loops (brute-force, LSH, IVF) evaluate millions of
    * dot products per task, and a CodegenFallback here forces a
    * boxed InternalRow round-trip per pair. */
  case class DotProduct(left: Expression, right: Expression)
      extends BinaryExpression with ExpectsInputTypes {
    override def inputTypes: Seq[TypeBridge.AbstractType] = Seq(TypeBridge.oneOf(ArrayType(FloatType), ArrayType(DoubleType)), TypeBridge.oneOf(ArrayType(FloatType), ArrayType(DoubleType)))

    override def dataType: DataType = DoubleType
    override def prettyName: String = "dot_product"

    private lazy val leftIsFloat = left.dataType match {
      case ArrayType(FloatType, _) => true
      case _ => false
    }
    private lazy val rightIsFloat = right.dataType match {
      case ArrayType(FloatType, _) => true
      case _ => false
    }

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, (a, b) => {
        val n = ctx.freshName("n"); val i = ctx.freshName("i")
        val acc = ctx.freshName("acc")
        val getA =
          if (leftIsFloat) s"(double) $a.getFloat($i)" else s"$a.getDouble($i)"
        val getB =
          if (rightIsFloat) s"(double) $b.getFloat($i)" else s"$b.getDouble($i)"
        s"""
           |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
           |double $acc = 0.0;
           |for (int $i = 0; $i < $n; $i++) {
           |  $acc += $getA * $getB;
           |}
           |${ev.value} = $acc;
         """.stripMargin
      })

    override def nullSafeEval(l: Any, r: Any): Any = {
      val a = l.asInstanceOf[ArrayData]
      val b = r.asInstanceOf[ArrayData]
      val n = math.min(a.numElements(), b.numElements())
      var acc = 0.0
      var i = 0
      while (i < n) {
        val x = if (leftIsFloat) a.getFloat(i).toDouble else a.getDouble(i)
        val y = if (rightIsFloat) b.getFloat(i).toDouble else b.getDouble(i)
        acc += x * y
        i += 1
      }
      java.lang.Double.valueOf(acc)
    }

    override protected def withNewChildrenInternal(
        newLeft: Expression, newRight: Expression): DotProduct =
      copy(left = newLeft, right = newRight)
  }

  /** All `nPlanes` random-hyperplane projections of an embedding in one
    * pass: proj_j = Σ_i emb[i]·(±1 by parity of ((A_j·(i+1)+B_j)² mod
    * P)). The SQUARE is load-bearing: A_j·(i+1)+B_j never exceeds P, so
    * its parity is just parity(i+1)·parity(A_j)⊕parity(B_j) — with
    * all-odd constants every plane j collapses to the SAME alternating
    * ±1 vector (measured: 2 distinct band hashes over the whole table,
    * a half-quadratic candidate join). Squaring pushes the value past P
    * so the mod genuinely mixes bits per (i, j) — measured 254–256
    * distinct hashes per 8-bit band. Accumulated as a sequential left
    * fold in doubles — bit-identical
    * to the `aggregate(zip_with(...))` per-plane formulation (x·1.0 and
    * x·(−1.0) are exact; addition order unchanged) and to the DuckDB
    * oracle's `list_reduce`, but one tight loop instead of
    * nPlanes×dim interpreted lambda calls (the dominant cost of the
    * LSH signature stage). */
  /** Top-`nProbe` nearest IVF cells for an embedding against a FIXED
    * centroid table — the cell-assignment step of
    * [[graft.operators.Similarity.buildIvfIndex]] as ONE row-local
    * expression instead of a crossJoin row explosion: the join shape
    * materializes N×K distance ROWS (~200 ns each of pure row
    * machinery) just to aggregate them straight back to N, which is
    * the whole build cost once K scales with N (sf10 measured 64 s of
    * which the 64-dim dots themselves are ~2 s). Here each row runs K
    * sequential-fold dots in a tight loop and keeps the nProbe best —
    * no exchange, no aggregate, no intermediate rows.
    *
    * Bit-parity with the join+agg formulation (and so with the q33
    * DuckDB oracle): dist = −dot(e, c) + dot(c, c)/2 with the same
    * sequential double folds as [[DotProduct]] (min-length loop;
    * c·c/2 is an exact halving), and the selection order is
    * java.lang.Double.compare on dist then cell ascending — exactly
    * the struct ordering `min(struct(dist, cell))` /
    * `array_sort(collect_list(struct(dist, cell)))` use (Min/array_sort
    * inputs are not join/agg KEYS, so NormalizeFloatingNumbers never
    * rewrites −0.0/NaN under them; −0.0 is unreachable here anyway
    * since c·c ≥ 0). Output: array<struct<dist: double, cell: int>>,
    * ascending, length min(nProbe, K).
    *
    * CodegenFallback is deliberate (same rationale as
    * [[LshProjections]]: a build-once/read-many intermediate that
    * must not be inlined per consumer). */
  case class NearestCells(child: Expression,
      centroids: Seq[(Int, Seq[Double])], nProbe: Int)
      extends UnaryExpression with CodegenFallback with ExpectsInputTypes {
    override def inputTypes: Seq[TypeBridge.AbstractType] = Seq(TypeBridge.oneOf(ArrayType(FloatType), ArrayType(DoubleType)))

    override def dataType: DataType = ArrayType(StructType(Seq(
      StructField("dist", DoubleType, nullable = false),
      StructField("cell", IntegerType, nullable = false))),
      containsNull = false)
    override def prettyName: String = "nearest_cells"

    private lazy val isFloat = child.dataType match {
      case ArrayType(FloatType, _) => true
      case _ => false
    }
    @transient private lazy val cellIds = centroids.map(_._1).toArray
    @transient private lazy val cents = centroids.map(_._2.toArray).toArray
    // c·c/2 per centroid, the same sequential fold the join computes
    // per row (the value is row-independent, so hoisting it is exact)
    @transient private lazy val halfCc = cents.map { c =>
      var acc = 0.0; var i = 0
      while (i < c.length) { acc += c(i) * c(i); i += 1 }
      acc / 2
    }

    override def nullSafeEval(input: Any): Any = {
      val e = input.asInstanceOf[ArrayData]
      val ne = e.numElements()
      // copy the vector to a primitive array ONCE per row: the dot
      // loop below runs cents.length × dim times, and going through
      // ArrayData's virtual getFloat per element made the k=1600
      // assignment ~102k virtual calls per row (the dominant cost of
      // a 200k-vector index build); identical double values, so the
      // fold is bit-unchanged
      val x = new Array[Double](ne)
      var xi = 0
      while (xi < ne) {
        x(xi) = if (isFloat) e.getFloat(xi).toDouble else e.getDouble(xi)
        xi += 1
      }
      val keep = math.min(math.max(nProbe, 1), cents.length)
      val bestD = new Array[Double](keep)
      val bestC = new Array[Int](keep)
      var filled = 0
      var k = 0
      while (k < cents.length) {
        val c = cents(k)
        val n = math.min(ne, c.length)
        var acc = 0.0
        var i = 0
        while (i < n) {
          acc += x(i) * c(i)
          i += 1
        }
        val d = -acc + halfCc(k)
        val cell = cellIds(k)
        // insertion into the sorted keep-list under (dist, cell) asc
        if (filled < keep ||
            java.lang.Double.compare(d, bestD(filled - 1)) < 0 ||
            (java.lang.Double.compare(d, bestD(filled - 1)) == 0 &&
              cell < bestC(filled - 1))) {
          var p = math.min(filled, keep - 1)
          while (p > 0 && {
            val cmp = java.lang.Double.compare(d, bestD(p - 1))
            cmp < 0 || (cmp == 0 && cell < bestC(p - 1))
          }) {
            bestD(p) = bestD(p - 1); bestC(p) = bestC(p - 1); p -= 1
          }
          bestD(p) = d; bestC(p) = cell
          if (filled < keep) filled += 1
        }
        k += 1
      }
      val rows = new Array[Any](filled)
      var j = 0
      while (j < filled) {
        rows(j) = org.apache.spark.sql.catalyst.InternalRow(bestD(j), bestC(j))
        j += 1
      }
      new GenericArrayData(rows)
    }

    override protected def withNewChildInternal(c: Expression): NearestCells =
      copy(child = c)
  }

  /** Cells that can contain a cosine-τ neighbor of the row vector —
    * the RADIUS-EXACT probe set for threshold search over an IVF
    * layout ([[NearestCells]]' sibling: top-k probing is right for
    * top-k search, but a THRESHOLD contract needs every cell the
    * radius ball touches, else recall silently drops on clustered
    * corpora). Geometry: cos(a,b) ≥ τ on nonzero vectors ⇔
    * ‖â−b̂‖ ≤ r = √(2−2τ) on the unit sphere, and by the triangle
    * inequality a qualifying b's home cell c(b) satisfies
    * ‖â−c‖ ≤ r + maxR_c where maxR_c is the cell's max normalized
    * assignment distance — so probing every cell with
    * ‖â−c‖² ≤ (r + maxR_c)² PROVABLY reaches every qualifying pair
    * (exact rescoring does the rest). `cells` carries
    * (cellId, centroid, maxR); a cell with maxR < 0 (empty in the
    * corpus) is never probed. Zero-norm rows emit no cells (cosine
    * with the zero vector is NaN — such rows never qualify). One
    * row-local K×dim pass, no exchange, output ascending cell ids. */
  case class CellsWithinRadius(child: Expression,
      cells: Seq[(Int, Seq[Double], Double)], radius: Double)
      extends UnaryExpression with CodegenFallback with ExpectsInputTypes {
    override def inputTypes: Seq[TypeBridge.AbstractType] = Seq(TypeBridge.oneOf(ArrayType(FloatType), ArrayType(DoubleType)))
    override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
    override def prettyName: String = "cells_within_radius"

    private lazy val isFloat = child.dataType match {
      case ArrayType(FloatType, _) => true
      case _ => false
    }
    @transient private lazy val cellIds = cells.map(_._1).toArray
    @transient private lazy val cents = cells.map(_._2.toArray).toArray
    @transient private lazy val cc = cents.map { c =>
      var acc = 0.0; var i = 0
      while (i < c.length) { acc += c(i) * c(i); i += 1 }
      acc
    }
    // (r + maxR_c + ε)² per cell; empty cells get -1 (never probed).
    // The ε pad (1e-9, orders above double rounding noise) absorbs the
    // different rounding paths of the probe's d² arithmetic vs the
    // corpus-side cdist (surrogate 1+2·dist → sqrt → float parquet
    // round-trip): a pair sitting exactly on the τ boundary in a
    // near-tight triangle configuration must not be rounded OUT of the
    // probe set. False candidates the pad admits cost one exact
    // rescore each, never correctness.
    @transient private lazy val bound2 = cells.map { case (_, _, maxR) =>
      if (maxR < 0) -1.0 else { val b = radius + maxR + 1e-9; b * b }
    }.toArray

    override def nullSafeEval(input: Any): Any = {
      val e = input.asInstanceOf[ArrayData]
      val ne = e.numElements()
      val x = new Array[Double](ne)
      var xi = 0
      var nn = 0.0
      while (xi < ne) {
        val v = if (isFloat) e.getFloat(xi).toDouble else e.getDouble(xi)
        x(xi) = v; nn += v * v; xi += 1
      }
      if (nn == 0.0) return new GenericArrayData(new Array[Any](0))
      val inv = 1.0 / math.sqrt(nn)
      val out = new Array[Int](cents.length)
      var filled = 0
      var k = 0
      while (k < cents.length) {
        if (bound2(k) >= 0) {
          val c = cents(k)
          val n = math.min(ne, c.length)
          var acc = 0.0
          var i = 0
          while (i < n) { acc += x(i) * c(i); i += 1 }
          // ‖x̂−c‖² = 1 − 2·x̂·c + c·c with x̂ = x/‖x‖
          val d2 = 1.0 - 2.0 * acc * inv + cc(k)
          if (d2 <= bound2(k)) { out(filled) = cellIds(k); filled += 1 }
        }
        k += 1
      }
      val rows = new Array[Any](filled)
      var j = 0
      while (j < filled) { rows(j) = out(j); j += 1 }
      new GenericArrayData(rows)
    }

    override protected def withNewChildInternal(c: Expression): CellsWithinRadius =
      copy(child = c)
  }

  case class LshProjections(child: Expression, nPlanes: Int)
      extends UnaryExpression with CodegenFallback with ExpectsInputTypes {
    override def inputTypes: Seq[TypeBridge.AbstractType] = Seq(TypeBridge.oneOf(ArrayType(FloatType), ArrayType(DoubleType)))

    // CodegenFallback is DELIBERATE here, unlike the other expressions
    // in this file: the projs array feeds nPlanes downstream getItem
    // band-bit expressions, and once this expression participates in
    // whole-stage codegen the planner inlines the full 32-plane × dim
    // fold into EVERY consumer (no cross-reference CSE) — measured 2×
    // on the LSH query. The fallback boundary forces the Project to
    // materialize the array once per row, which is exactly the right
    // evaluation shape for a build-once/read-many intermediate.
    private val A = TextFunctions.LshA.toArray
    private val B = TextFunctions.LshB.toArray
    require(nPlanes <= A.length, s"at most ${A.length} planes")
    override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
    override def prettyName: String = "lsh_projections"


    private lazy val isFloat = child.dataType match {
      case ArrayType(FloatType, _) => true
      case _ => false
    }

    override def nullSafeEval(input: Any): Any = {
      val e = input.asInstanceOf[ArrayData]
      val n = e.numElements()
      // one primitive copy per row (the NearestCells discipline): the
      // plane loop reads nPlanes × dim elements per row
      val xs = new Array[Double](n)
      var xi = 0
      while (xi < n) {
        xs(xi) = if (isFloat) e.getFloat(xi).toDouble else e.getDouble(xi)
        xi += 1
      }
      val out = new Array[Double](nPlanes)
      var j = 0
      while (j < nPlanes) {
        val a = A(j)
        val b = B(j)
        var acc = 0.0
        var i = 0
        while (i < n) {
          val x = xs(i)
          val h = a * (i + 1) + b // ≤ ~1.3e7, so h² < 2^63: no overflow
          if (h * h % P % 2 == 0) acc += x else acc += -x
          i += 1
        }
        out(j) = acc
        j += 1
      }
      new GenericArrayData(out)
    }

    override protected def withNewChildInternal(c: Expression): LshProjections =
      copy(child = c)
  }

  /** Per-query-term frequency counts over the whitespace tokens of a
    * text column, one tokenization pass per row — the keyword-search
    * (q59) hot path. Equals `terms.map(t => size(filter(tokens(text),
    * x => x === t)))` but does ONE scan of the text instead of
    * |terms| interpreted filter lambdas over a materialized token
    * array. Tokens are maximal runs of non-whitespace (Java regex
    * `\s` = space \t \n \x0B \f \r — the same class `split(text,
    * "\\s+")` uses), so counts match the HOF formulation and the
    * DuckDB `string_split_regex` oracle exactly.
    *
    * CodegenFallback is deliberate (same rationale as
    * [[LshProjections]]): the counts array feeds |terms| downstream
    * getItem consumers, and letting the fold inline into each of them
    * re-tokenizes the document per term; the fallback boundary
    * materializes the array once per row. */
  case class TermFreqs(child: Expression, terms: Seq[String])
      extends UnaryExpression with CodegenFallback with ExpectsInputTypes {
    override def inputTypes: Seq[TypeBridge.AbstractType] = Seq(StringType)

    require(terms.nonEmpty, "at least one term")
    override def dataType: DataType = ArrayType(LongType, containsNull = false)
    override def prettyName: String = "term_freqs"

    @transient private lazy val idx: java.util.HashMap[String, Integer] = {
      val m = new java.util.HashMap[String, Integer](terms.size * 2)
      terms.zipWithIndex.foreach { case (t, i) => m.put(t, i) }
      m
    }

    private def isWs(c: Char): Boolean =
      c == ' ' || c == '\t' || c == '\n' || c == '\u000B' || c == '\f' || c == '\r'

    override def nullSafeEval(input: Any): Any = {
      val s = input.asInstanceOf[UTF8String].toString
      val counts = new Array[Long](terms.size)
      val len = s.length
      var i = 0
      while (i < len) {
        while (i < len && isWs(s.charAt(i))) i += 1
        val start = i
        while (i < len && !isWs(s.charAt(i))) i += 1
        if (i > start) {
          val hit = idx.get(s.substring(start, i))
          if (hit != null) counts(hit) += 1L
        }
      }
      new GenericArrayData(counts)
    }

    override protected def withNewChildInternal(c: Expression): TermFreqs =
      copy(child = c)
  }

  /** Whitespace tokens of a string as a string array — the native
    * one-pass form of `filter(split(text, "\\s+"), _ != "")`, which
    * both compiles a regex `Pattern` per row inside `split` and
    * interprets one filter lambda per token. Same token semantics as
    * [[TermFreqs]]/[[TokenHashSet]] (maximal non-`\s` runs), so values
    * match the HOF formulation and the `string_split_regex` oracles
    * exactly — [[TextFunctions.tokens]] delegates here and every
    * token-exploding operator inherits the fast path. Single consumer
    * (explode / size / transform) → ref-object codegen keeps the
    * enclosing stage intact. */
  case class TokenArray(child: Expression)
      extends UnaryExpression with ExpectsInputTypes {
    override def inputTypes: Seq[TypeBridge.AbstractType] = Seq(StringType)

    override def dataType: DataType = ArrayType(StringType, containsNull = false)
    override def prettyName: String = "token_array"

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val ref = ctx.addReferenceObj("tokenArrayExpr", this,
        classOf[TokenArray].getName)
      defineCodeGen(ctx, ev, c =>
        s"(org.apache.spark.sql.catalyst.util.ArrayData) $ref.nullSafeEval($c)")
    }

    private def isWs(c: Char): Boolean =
      c == ' ' || c == '\t' || c == '\n' || c == '\u000B' || c == '\f' || c == '\r'

    override def nullSafeEval(input: Any): Any = {
      val s = input.asInstanceOf[UTF8String].toString
      val len = s.length
      val out = new java.util.ArrayList[UTF8String]()
      var i = 0
      while (i < len) {
        while (i < len && isWs(s.charAt(i))) i += 1
        val start = i
        while (i < len && !isWs(s.charAt(i))) i += 1
        if (i > start) out.add(UTF8String.fromString(s.substring(start, i)))
      }
      new GenericArrayData(out.toArray)
    }

    override protected def withNewChildInternal(c: Expression): TokenArray =
      copy(child = c)
  }

  /** Sorted polynomial hashes of the DISTINCT whitespace tokens of a
    * text column — one pass, equal to
    * `array_sort(tokenHashes(tokenSet(text)))` (distinct applies to
    * token STRINGS first, so two distinct tokens colliding to one hash
    * value keep both copies, exactly like the HOF/oracle form) but
    * without the per-character `aggregate(split(t, ''))` lambda per
    * token. Sorted output feeds [[SortedJaccard]] directly. Single
    * downstream consumer → ref-object codegen keeps the enclosing
    * WholeStageCodegen stage intact (see [[ShingleHashes]] note). */
  case class TokenHashSet(child: Expression)
      extends UnaryExpression with ExpectsInputTypes {
    override def inputTypes: Seq[TypeBridge.AbstractType] = Seq(StringType)

    override def dataType: DataType = ArrayType(LongType, containsNull = false)
    override def prettyName: String = "token_hash_set"

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val ref = ctx.addReferenceObj("tokenHashSetExpr", this,
        classOf[TokenHashSet].getName)
      defineCodeGen(ctx, ev, c =>
        s"(org.apache.spark.sql.catalyst.util.ArrayData) $ref.nullSafeEval($c)")
    }

    private def isWs(c: Char): Boolean =
      c == ' ' || c == '\t' || c == '\n' || c == '\u000B' || c == '\f' || c == '\r'

    override def nullSafeEval(input: Any): Any = {
      val s = input.asInstanceOf[UTF8String].toString
      val len = s.length
      val seen = new java.util.HashSet[String]()
      val hashes = new java.util.ArrayList[java.lang.Long]()
      var i = 0
      while (i < len) {
        while (i < len && isWs(s.charAt(i))) i += 1
        val start = i
        while (i < len && !isWs(s.charAt(i))) i += 1
        if (i > start) {
          val tok = s.substring(start, i)
          if (seen.add(tok)) {
            var h = 0L
            var j = 0
            while (j < tok.length) { h = (h * 31 + tok.charAt(j)) % P; j += 1 }
            hashes.add(h)
          }
        }
      }
      val arr = new Array[Long](hashes.size)
      var k = 0
      while (k < arr.length) { arr(k) = hashes.get(k); k += 1 }
      java.util.Arrays.sort(arr)
      new GenericArrayData(arr)
    }

    override protected def withNewChildInternal(c: Expression): TokenHashSet =
      copy(child = c)
  }

  /** Distinct polynomial hashes of the space-joined n-TOKEN windows of
    * a text column — the gram-index builder of the decontamination /
    * span-dedup family, in one pass. Equals
    * `array_distinct(transform(sequence(1, size(tk)-n+1),
    * i => polyHash(concat_ws(" ", slice(tk, i, n)))))` over
    * `tk = tokens(text)`: same tokenization ([[TokenArray]]), same
    * hash over the gram's characters INCLUDING the single joining
    * spaces, same first-occurrence distinct order, same empty array
    * when the document has fewer than `n` tokens — but no interpreted
    * window lambda, no per-gram string/array allocation. */
  case class TokenNGramHashes(child: Expression, n: Int)
      extends UnaryExpression with ExpectsInputTypes {
    override def inputTypes: Seq[TypeBridge.AbstractType] = Seq(StringType)

    require(n >= 1, "gram size >= 1")
    override def dataType: DataType = ArrayType(LongType, containsNull = false)
    override def prettyName: String = "token_ngram_hashes"

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val ref = ctx.addReferenceObj("tokenNGramExpr", this,
        classOf[TokenNGramHashes].getName)
      defineCodeGen(ctx, ev, c =>
        s"(org.apache.spark.sql.catalyst.util.ArrayData) $ref.nullSafeEval($c)")
    }

    private def isWs(c: Char): Boolean =
      c == ' ' || c == '\t' || c == '\n' || c == '\u000B' || c == '\f' || c == '\r'

    override def nullSafeEval(input: Any): Any = {
      val s = input.asInstanceOf[UTF8String].toString
      val len = s.length
      // token boundaries [start, end) in one scan
      val starts = new java.util.ArrayList[Integer]()
      val ends = new java.util.ArrayList[Integer]()
      var i = 0
      while (i < len) {
        while (i < len && isWs(s.charAt(i))) i += 1
        val st = i
        while (i < len && !isWs(s.charAt(i))) i += 1
        if (i > st) { starts.add(st); ends.add(i) }
      }
      val m = starts.size()
      if (m < n) return new GenericArrayData(Array.empty[Long])
      val seen = new java.util.LinkedHashSet[java.lang.Long]()
      var w = 0
      while (w <= m - n) {
        var h = 0L
        var t = w
        while (t < w + n) {
          if (t > w) h = (h * 31 + 32) % P // the joining ' ' (codepoint 32)
          var k = starts.get(t).intValue()
          val e = ends.get(t).intValue()
          while (k < e) { h = (h * 31 + s.charAt(k)) % P; k += 1 }
          t += 1
        }
        seen.add(h)
        w += 1
      }
      val arr = new Array[Long](seen.size)
      val it = seen.iterator()
      var j = 0
      while (it.hasNext) { arr(j) = it.next(); j += 1 }
      new GenericArrayData(arr)
    }

    override protected def withNewChildInternal(c: Expression): TokenNGramHashes =
      copy(child = c)
  }

  /** Production fast path for [[TokenNGramHashes]]: same whitespace
    * tokenization (byte-level — the 6 ASCII ws bytes never occur
    * inside a multi-byte UTF-8 sequence, so segmentation is identical
    * to the char-level scan), but each token's BYTES are xxhash64'd
    * once and each window combines n precomputed token hashes — O(len
    * + windows·n) instead of the exact path's O(len·n) re-hash of
    * every character per window. Values are a different hash family
    * than the polyhash oracle, so operators keep the exact path as
    * default and offer this behind `fastGrams`; span-dedup /
    * decontamination OUTPUT is identical on collision-free inputs
    * (CorpusSpec pins parity at gate scale). Beyond ~10⁵ grams the
    * polyhash's 2³⁰ modulus hits the birthday regime and phantom-
    * matches where this 2⁶⁴ family does not — measured at 500 k docs
    * in STRESS.md round 10 (the fast path's survivor set was a strict
    * superset; the delta was 100 % polyhash phantoms). Works on the
    * raw UTF8String — no String materialization at all. */
  case class TokenNGramXxHashes(child: Expression, n: Int)
      extends UnaryExpression with ExpectsInputTypes {
    override def inputTypes: Seq[TypeBridge.AbstractType] = Seq(StringType)

    require(n >= 1, "gram size >= 1")
    override def dataType: DataType = ArrayType(LongType, containsNull = false)
    override def prettyName: String = "token_ngram_xxhashes"

    private final val Seed = 42L
    // odd 64-bit mix constant (golden-ratio) for the window polynomial
    private final val M = 0x9E3779B97F4A7C15L

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val ref = ctx.addReferenceObj("tokenNGramXxExpr", this,
        classOf[TokenNGramXxHashes].getName)
      defineCodeGen(ctx, ev, c =>
        s"(org.apache.spark.sql.catalyst.util.ArrayData) $ref.nullSafeEval($c)")
    }

    private def isWs(b: Byte): Boolean =
      b == 0x20 || b == 0x09 || b == 0x0A || b == 0x0B || b == 0x0C || b == 0x0D

    override def nullSafeEval(input: Any): Any = {
      import org.apache.spark.unsafe.Platform
      val u = input.asInstanceOf[UTF8String]
      val base = u.getBaseObject
      val off = u.getBaseOffset
      val nb = u.numBytes
      var starts = new Array[Int](16)
      var lens = new Array[Int](16)
      var m = 0
      var i = 0
      while (i < nb) {
        while (i < nb && isWs(Platform.getByte(base, off + i))) i += 1
        val st = i
        while (i < nb && !isWs(Platform.getByte(base, off + i))) i += 1
        if (i > st) {
          if (m == starts.length) {
            starts = java.util.Arrays.copyOf(starts, m * 2)
            lens = java.util.Arrays.copyOf(lens, m * 2)
          }
          starts(m) = st; lens(m) = i - st; m += 1
        }
      }
      if (m < n) return new GenericArrayData(Array.empty[Long])
      val th = new Array[Long](m)
      i = 0
      while (i < m) {
        th(i) = XXH64.hashUnsafeBytes(base, off + starts(i), lens(i), Seed)
        i += 1
      }
      val seen = new java.util.LinkedHashSet[java.lang.Long]()
      var w = 0
      while (w <= m - n) {
        var h = Seed
        var t = w
        while (t < w + n) { h = h * M + th(t); t += 1 }
        seen.add(h)
        w += 1
      }
      val arr = new Array[Long](seen.size)
      val it = seen.iterator()
      var j = 0
      while (it.hasNext) { arr(j) = it.next(); j += 1 }
      new GenericArrayData(arr)
    }

    override protected def withNewChildInternal(c: Expression): TokenNGramXxHashes =
      copy(child = c)
  }

  /** |a ∩ b| of two SORTED distinct long arrays — [[SortedJaccard]]'s
    * counting twin, for LOSSLESS q-gram prefilters where the bound is
    * on the intersection COUNT, not the ratio (edit-distance pruning:
    * dist ≤ k ⇒ |D(a) ∩ D(b)| ≥ max(|D(a)|,|D(b)|) − k·n, since each
    * of the ≤ k edits destroys at most n distinct n-grams). Same
    * whole-stage-codegen merge scan. */
  case class SortedIntersectCount(left: Expression, right: Expression)
      extends BinaryExpression with ExpectsInputTypes {
    override def inputTypes: Seq[TypeBridge.AbstractType] =
      Seq(ArrayType(LongType), ArrayType(LongType))
    override def dataType: DataType = LongType
    override def prettyName: String = "sorted_intersect_count"

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, (a, b) => {
        val na = ctx.freshName("na"); val nb = ctx.freshName("nb")
        val i = ctx.freshName("i"); val j = ctx.freshName("j")
        val inter = ctx.freshName("inter")
        val x = ctx.freshName("x"); val y = ctx.freshName("y")
        s"""
           |int $na = $a.numElements();
           |int $nb = $b.numElements();
           |int $i = 0; int $j = 0; long $inter = 0L;
           |while ($i < $na && $j < $nb) {
           |  long $x = $a.getLong($i);
           |  long $y = $b.getLong($j);
           |  if ($x == $y) { $inter++; $i++; $j++; }
           |  else if ($x < $y) { $i++; } else { $j++; }
           |}
           |${ev.value} = $inter;
         """.stripMargin
      })

    override def nullSafeEval(l: Any, r: Any): Any = {
      val a = l.asInstanceOf[ArrayData]
      val b = r.asInstanceOf[ArrayData]
      var i = 0; var j = 0; var inter = 0L
      while (i < a.numElements() && j < b.numElements()) {
        val x = a.getLong(i); val y = b.getLong(j)
        if (x == y) { inter += 1; i += 1; j += 1 }
        else if (x < y) i += 1 else j += 1
      }
      java.lang.Long.valueOf(inter)
    }

    override protected def withNewChildrenInternal(
        newLeft: Expression, newRight: Expression): SortedIntersectCount =
      copy(left = newLeft, right = newRight)
  }

  /** 30-bit simhash over a long-array of token/shingle hashes — one
    * pass, equal to [[TextFunctions.simHash30]] (bit b set when
    * Σ (±1 by bit b of each hash) > 0) which interprets 30×|hashes|
    * lambda calls per document. Bit test here is a plain mask; the
    * HOF's `pmod(h, 2^(b+1)) >= 2^b` is the same bit for nonnegative
    * hashes (all hashes are mod-P remainders ≥ 0). */
  case class SimHash30(child: Expression)
      extends UnaryExpression with ExpectsInputTypes {
    override def inputTypes: Seq[TypeBridge.AbstractType] = Seq(ArrayType(LongType))

    override def dataType: DataType = LongType
    override def prettyName: String = "simhash30"

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val ref = ctx.addReferenceObj("simHashExpr", this,
        classOf[SimHash30].getName)
      defineCodeGen(ctx, ev, c =>
        s"((java.lang.Long) $ref.nullSafeEval($c)).longValue()")
    }

    override def nullSafeEval(input: Any): Any = {
      val hashes = input.asInstanceOf[ArrayData]
      val counts = new Array[Int](30)
      val m = hashes.numElements()
      var i = 0
      while (i < m) {
        val h = hashes.getLong(i)
        var b = 0
        while (b < 30) {
          if (((h >> b) & 1L) != 0L) counts(b) += 1 else counts(b) -= 1
          b += 1
        }
        i += 1
      }
      var sig = 0L
      var b = 29
      while (b >= 0) {
        sig = sig * 2 + (if (counts(b) > 0) 1L else 0L)
        b -= 1
      }
      java.lang.Long.valueOf(sig)
    }

    override protected def withNewChildInternal(c: Expression): SimHash30 =
      copy(child = c)
  }

  /** Per-subspace squared L2 distance for PQ: the `sub`-th `dsub`-wide
    * slice of a float/double embedding against a double centroid
    * array, summed as a sequential left fold in doubles — bit-equal to
    * the `aggregate(zip_with(slice(...)))` HOF form (same index order,
    * (x−c)² exact in double) and to the oracle's `list_reduce`, minus
    * the three interpreted lambdas per (vector, subspace, code) row.
    * Children: (embedding, centroid, sub). Participates in whole-stage
    * codegen via a direct loop. */
  case class SubSquaredDist(emb: Expression, cent: Expression,
      sub: Expression, dsub: Int) extends TernaryExpression with ExpectsInputTypes {
    override def inputTypes: Seq[TypeBridge.AbstractType] = Seq(TypeBridge.oneOf(ArrayType(FloatType), ArrayType(DoubleType)), ArrayType(DoubleType), IntegerType)

    require(dsub >= 1, "dsub >= 1")
    override def first: Expression = emb
    override def second: Expression = cent
    override def third: Expression = sub
    override def dataType: DataType = DoubleType
    override def prettyName: String = "sub_squared_dist"

    private lazy val embIsFloat = emb.dataType match {
      case ArrayType(FloatType, _) => true
      case _ => false
    }

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, (e, c, s) => {
        val i = ctx.freshName("i"); val off = ctx.freshName("off")
        val acc = ctx.freshName("acc"); val d = ctx.freshName("d")
        val getX = if (embIsFloat) s"(double) $e.getFloat($off + $i)"
                   else s"$e.getDouble($off + $i)"
        s"""
           |int $off = ((int) $s) * $dsub;
           |double $acc = 0.0;
           |for (int $i = 0; $i < $dsub; $i++) {
           |  double $d = $getX - $c.getDouble($i);
           |  $acc += $d * $d;
           |}
           |${ev.value} = $acc;
         """.stripMargin
      })

    override def nullSafeEval(e: Any, c: Any, s: Any): Any = {
      val embArr = e.asInstanceOf[ArrayData]
      val centArr = c.asInstanceOf[ArrayData]
      val off = s.asInstanceOf[Number].intValue() * dsub
      var acc = 0.0
      var i = 0
      while (i < dsub) {
        val x = if (embIsFloat) embArr.getFloat(off + i).toDouble
                else embArr.getDouble(off + i)
        val d = x - centArr.getDouble(i)
        acc += d * d
        i += 1
      }
      java.lang.Double.valueOf(acc)
    }

    override protected def withNewChildrenInternal(
        f: Expression, sN: Expression, t: Expression): SubSquaredDist =
      copy(emb = f, cent = sN, sub = t)
  }

  /** Row-local PQ encoding: for each of the m subspaces, the code of
    * the nearest codeword — per-code distance and tie-break
    * bit-identical to the former join shape (`crossJoin(broadcast(
    * codebooks)) + min(struct(SubSquaredDist, code))`): the same
    * sequential (x−c)² fold per (sub, code), min over codes with
    * lowest-code ties (codes scanned ascending, strict <). The join
    * shape materialized N×m×nCodes distance ROWS only to aggregate
    * them straight back to N (the [[NearestCells]] lesson, PQ form) —
    * at 256 codes that was 410 M rows and 178 s for a 200 k-vector
    * index build; this is one narrow map. Output: array<int> of m
    * codes ordered by sub. */
  case class PqEncode(child: Expression,
      codebooks: Seq[(Int, Int, Seq[Double])], dsub: Int)
      extends UnaryExpression with CodegenFallback with ExpectsInputTypes {
    override def inputTypes: Seq[TypeBridge.AbstractType] =
      Seq(TypeBridge.oneOf(ArrayType(FloatType), ArrayType(DoubleType)))
    require(dsub >= 1, "dsub >= 1")
    override def dataType: DataType =
      ArrayType(IntegerType, containsNull = false)
    override def prettyName: String = "pq_encode"

    private lazy val isFloat = child.dataType match {
      case ArrayType(FloatType, _) => true
      case _ => false
    }
    // per-subspace codeword tables, codes ascending within a sub
    @transient private lazy val subs: Array[(Int, Array[(Int, Array[Double])])] =
      codebooks.groupBy(_._1).toArray.sortBy(_._1).map { case (s, rows) =>
        (s, rows.sortBy(_._2).map(r => (r._2, r._3.toArray)).toArray)
      }

    override def nullSafeEval(input: Any): Any = {
      val e = input.asInstanceOf[ArrayData]
      // one primitive copy per row (the NearestCells discipline): the
      // inner loops read m×nCodes×dsub elements per row
      val ne = e.numElements()
      val x = new Array[Double](ne)
      var xi = 0
      while (xi < ne) {
        x(xi) = if (isFloat) e.getFloat(xi).toDouble else e.getDouble(xi)
        xi += 1
      }
      val out = new Array[Int](subs.length)
      var si = 0
      while (si < subs.length) {
        val (sub, words) = subs(si)
        val off = sub * dsub
        var bestD = Double.PositiveInfinity
        var bestC = Int.MaxValue
        var w = 0
        while (w < words.length) {
          val (code, cent) = words(w)
          var acc = 0.0
          var i = 0
          while (i < dsub) {
            val d = x(off + i) - cent(i)
            acc += d * d
            i += 1
          }
          // strict <: codes ascend, so ties keep the lowest code —
          // exactly min(struct(dist, code))
          if (java.lang.Double.compare(acc, bestD) < 0) {
            bestD = acc; bestC = code
          }
          w += 1
        }
        out(si) = bestC
        si += 1
      }
      new GenericArrayData(out.map(Int.box(_): Any))
    }

    override protected def withNewChildInternal(c: Expression): PqEncode =
      copy(child = c)
  }

  /** Row-local RESIDUAL IVFPQ encoding (the FAISS IndexIVFPQ form,
    * Jégou et al. TPAMI 2011 §V): assign the vector's home IVF cell
    * (the [[NearestCells]] arithmetic — dist = −x·c + c·c/2 with
    * hoisted c·c/2, (dist, cell)-ascending tie-break), subtract that
    * cell's centroid in double precision, then PQ-encode the RESIDUAL
    * x − centroid(cell) against per-subspace codebooks (the
    * [[PqEncode]] loop, same strict-< lowest-code tie-break).
    * Residual magnitudes are ~an order smaller than raw coordinates,
    * so the same m×k byte budget buys far tighter quantization — the
    * recall difference between a usable and a cosmetic IVFADC index at
    * 10⁹ vectors. One narrow map builds the whole index row: no join,
    * no shuffle. Output: struct<cell: int, codes: array<int>>.
    * Every step is exact double arithmetic over literal quantizers, so
    * an external SQL engine reproduces cell, residual and codes
    * bit-for-bit (the q91 oracle). */
  case class PqEncodeResidual(child: Expression,
      centroids: Seq[(Int, Seq[Double])],
      codebooks: Seq[(Int, Int, Seq[Double])], dsub: Int)
      extends UnaryExpression with CodegenFallback with ExpectsInputTypes {
    override def inputTypes: Seq[TypeBridge.AbstractType] =
      Seq(TypeBridge.oneOf(ArrayType(FloatType), ArrayType(DoubleType)))
    require(dsub >= 1, "dsub >= 1")
    require(centroids.nonEmpty, "need centroids")
    override def dataType: DataType = StructType(Seq(
      StructField("cell", IntegerType, nullable = false),
      StructField("codes", ArrayType(IntegerType, containsNull = false),
        nullable = false)))
    override def prettyName: String = "pq_encode_residual"

    private lazy val isFloat = child.dataType match {
      case ArrayType(FloatType, _) => true
      case _ => false
    }
    @transient private lazy val cellIds = centroids.map(_._1).toArray
    @transient private lazy val cents = centroids.map(_._2.toArray).toArray
    @transient private lazy val halfCc = cents.map { c =>
      var acc = 0.0; var i = 0
      while (i < c.length) { acc += c(i) * c(i); i += 1 }
      acc / 2
    }
    @transient private lazy val centByCell: Map[Int, Array[Double]] =
      centroids.map { case (id, c) => id -> c.toArray }.toMap
    @transient private lazy val subs: Array[(Int, Array[(Int, Array[Double])])] =
      codebooks.groupBy(_._1).toArray.sortBy(_._1).map { case (s, rows) =>
        (s, rows.sortBy(_._2).map(r => (r._2, r._3.toArray)).toArray)
      }

    override def nullSafeEval(input: Any): Any = {
      val e = input.asInstanceOf[ArrayData]
      val ne = e.numElements()
      // one primitive copy per row (the NearestCells discipline)
      val x = new Array[Double](ne)
      var xi = 0
      while (xi < ne) {
        x(xi) = if (isFloat) e.getFloat(xi).toDouble else e.getDouble(xi)
        xi += 1
      }
      // home cell: min (dist, cell) over the centroid family
      var bestD = Double.PositiveInfinity
      var bestCell = Int.MaxValue
      var k = 0
      while (k < cents.length) {
        val c = cents(k)
        val n = math.min(ne, c.length)
        var acc = 0.0
        var i = 0
        while (i < n) { acc += x(i) * c(i); i += 1 }
        val d = -acc + halfCc(k)
        val cmp = java.lang.Double.compare(d, bestD)
        if (cmp < 0 || (cmp == 0 && cellIds(k) < bestCell)) {
          bestD = d; bestCell = cellIds(k)
        }
        k += 1
      }
      // residual in double — the quantity the codebooks quantize
      val cent = centByCell(bestCell)
      val r = new Array[Double](ne)
      var ri = 0
      while (ri < ne) {
        r(ri) = x(ri) - (if (ri < cent.length) cent(ri) else 0.0)
        ri += 1
      }
      // PQ-encode the residual (the PqEncode loop verbatim)
      val out = new Array[Int](subs.length)
      var si = 0
      while (si < subs.length) {
        val (sub, words) = subs(si)
        val off = sub * dsub
        var bd = Double.PositiveInfinity
        var bc = Int.MaxValue
        var w = 0
        while (w < words.length) {
          val (code, cw) = words(w)
          var acc = 0.0
          var i = 0
          while (i < dsub) {
            val d = r(off + i) - cw(i)
            acc += d * d
            i += 1
          }
          if (java.lang.Double.compare(acc, bd) < 0) { bd = acc; bc = code }
          w += 1
        }
        out(si) = bc
        si += 1
      }
      org.apache.spark.sql.catalyst.InternalRow(bestCell,
        new GenericArrayData(out.map(Int.box(_): Any)))
    }

    override protected def withNewChildInternal(c: Expression): PqEncodeResidual =
      copy(child = c)
  }

  /** DIRECT asymmetric PQ distance — Σ_s Σ_j (res[s·dsub+j] −
    * cb(s, codes[s])[j])² with the codebooks as literal data: the
    * per-pair form of ADC for SELF-search, where queries == corpus and
    * a per-query m×k distance table ([[AdcSum]]'s input) cannot ride
    * the join (n·nProbe rows × m·k doubles is quadratic-ish traffic;
    * the residual vector is dim doubles flat). Per-pair cost is dim
    * mult-adds — the same flops as one dot product — but the INDEX
    * side still carries only m code bytes per vector, which is the
    * point: the corpus' raw vectors never shuffle. Bit-parity with
    * building the candidate's dtab row and [[AdcSum]]-ing it
    * (sequential j fold within sub, subs ascending — HashExprSpec
    * cross-checks). */
  case class AdcDirectDist(res: Expression, codes: Expression,
      codebooks: Seq[(Int, Int, Seq[Double])], dsub: Int)
      extends BinaryExpression with ExpectsInputTypes {
    override def inputTypes: Seq[TypeBridge.AbstractType] =
      Seq(ArrayType(DoubleType), ArrayType(IntegerType))
    require(dsub >= 1, "dsub >= 1")
    override def left: Expression = res
    override def right: Expression = codes
    override def dataType: DataType = DoubleType
    override def prettyName: String = "adc_direct_dist"

    // codeword table: cw(sub)(code) -> Array[Double](dsub)
    @transient private lazy val cw: Array[Array[Array[Double]]] = {
      val bySub = codebooks.groupBy(_._1)
      (0 to bySub.keys.max).toArray.map { s =>
        val rows = bySub.getOrElse(s, Seq.empty)
        val maxCode = if (rows.isEmpty) -1 else rows.map(_._2).max
        val arr = Array.ofDim[Array[Double]](maxCode + 1)
        rows.foreach { case (_, c, cent) => arr(c) = cent.toArray }
        arr
      }
    }

    override def nullSafeEval(r: Any, c: Any): Any = {
      val resArr = r.asInstanceOf[ArrayData]
      val codesArr = c.asInstanceOf[ArrayData]
      val m = codesArr.numElements()
      var acc = 0.0
      var s = 0
      while (s < m) {
        val word = cw(s)(codesArr.getInt(s))
        val off = s * dsub
        // per-sub PARTIAL then one outer add — the association AdcSum
        // uses (its dtab entries are complete per-sub folds), so the
        // two forms are bit-equal, not just close
        var sub = 0.0
        var j = 0
        while (j < dsub) {
          val d = resArr.getDouble(off + j) - word(j)
          sub += d * d
          j += 1
        }
        acc += sub
        s += 1
      }
      java.lang.Double.valueOf(acc)
    }

    // Real codegen, not the ShingleHashes reference-object hybrid: the
    // output is one scalar with one consumer (no build-once/read-many
    // duplication risk), and this runs once per CANDIDATE of the ADC
    // self-search join (~10¹⁰ rows at 2 M vectors) where the
    // interpreted path's Double boxing + megamorphic eval dominate.
    // The loop reproduces nullSafeEval exactly (per-sub partial, then
    // one outer add) so codegen ≡ interpreted bit-for-bit.
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val cwRef = ctx.addReferenceObj("adcCw", cw, "double[][][]")
      nullSafeCodeGen(ctx, ev, (r, c) => {
        val m = ctx.freshName("m"); val acc = ctx.freshName("acc")
        val s = ctx.freshName("s"); val j = ctx.freshName("j")
        val word = ctx.freshName("word"); val off = ctx.freshName("off")
        val sub = ctx.freshName("sub"); val d = ctx.freshName("d")
        s"""
        final int $m = $c.numElements();
        double $acc = 0.0;
        for (int $s = 0; $s < $m; $s++) {
          final double[] $word = $cwRef[$s][$c.getInt($s)];
          final int $off = $s * $dsub;
          double $sub = 0.0;
          for (int $j = 0; $j < $dsub; $j++) {
            final double $d = $r.getDouble($off + $j) - $word[$j];
            $sub += $d * $d;
          }
          $acc += $sub;
        }
        ${ev.value} = $acc;
        """
      })
    }

    override protected def withNewChildrenInternal(
        newLeft: Expression, newRight: Expression): AdcDirectDist =
      copy(res = newLeft, codes = newRight)
  }

  /** Elementwise vector difference (double): out[i] = (double)a[i] −
    * b[i] over min(len) — the residual compute x − centroid(cell) as
    * one codegen'd loop instead of an interpreted `zip_with` lambda
    * per element (bit-identical values: same cast, same IEEE
    * subtraction; HashExprSpec pins parity). Hot on the self-search
    * probe side (n·nProbe rows × dim lambda evals otherwise). */
  case class VecSub(a: Expression, b: Expression)
      extends BinaryExpression with ExpectsInputTypes {
    override def inputTypes: Seq[TypeBridge.AbstractType] =
      Seq(TypeBridge.oneOf(ArrayType(FloatType), ArrayType(DoubleType)),
        ArrayType(DoubleType))
    override def left: Expression = a
    override def right: Expression = b
    override def dataType: DataType =
      ArrayType(DoubleType, containsNull = false)
    override def prettyName: String = "vec_sub"

    private lazy val isFloat = a.dataType match {
      case ArrayType(FloatType, _) => true
      case _ => false
    }

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, (x, y) => {
        val i = ctx.freshName("i"); val n = ctx.freshName("n")
        val out = ctx.freshName("out")
        val getX = if (isFloat) s"(double) $x.getFloat($i)"
                   else s"$x.getDouble($i)"
        s"""
           |int $n = java.lang.Math.min($x.numElements(), $y.numElements());
           |double[] $out = new double[$n];
           |for (int $i = 0; $i < $n; $i++) {
           |  $out[$i] = $getX - $y.getDouble($i);
           |}
           |${ev.value} =
           |  org.apache.spark.sql.catalyst.util.ArrayData.toArrayData($out);
         """.stripMargin
      })

    override def nullSafeEval(x: Any, y: Any): Any = {
      val xa = x.asInstanceOf[ArrayData]
      val ya = y.asInstanceOf[ArrayData]
      val n = math.min(xa.numElements(), ya.numElements())
      val out = new Array[Double](n)
      var i = 0
      while (i < n) {
        out(i) = (if (isFloat) xa.getFloat(i).toDouble else xa.getDouble(i)) -
          ya.getDouble(i)
        i += 1
      }
      org.apache.spark.sql.catalyst.util.ArrayData.toArrayData(out)
    }

    override protected def withNewChildrenInternal(
        newLeft: Expression, newRight: Expression): VecSub =
      copy(a = newLeft, b = newRight)
  }

  /** PQ asymmetric-distance sum: Σ_s dtab[s·nCodes + codes[s]] as a
    * sequential double fold over the code array — bit-equal to the
    * `aggregate(sequence(0, m−1), acc + element_at(...))` HOF form
    * (ascending s, double addition) without the per-candidate
    * interpreted lambda chain; this is the inner loop of the ADC scan,
    * evaluated once per (query, candidate). */
  case class AdcSum(codes: Expression, dtab: Expression, nCodes: Int)
      extends BinaryExpression with ExpectsInputTypes {
    override def inputTypes: Seq[TypeBridge.AbstractType] = Seq(ArrayType(IntegerType), ArrayType(DoubleType))

    require(nCodes >= 1, "nCodes >= 1")
    override def left: Expression = codes
    override def right: Expression = dtab
    override def dataType: DataType = DoubleType
    override def prettyName: String = "adc_sum"

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, (c, t) => {
        val s = ctx.freshName("s"); val m = ctx.freshName("m")
        val acc = ctx.freshName("acc")
        s"""
           |int $m = $c.numElements();
           |double $acc = 0.0;
           |for (int $s = 0; $s < $m; $s++) {
           |  $acc += $t.getDouble($s * $nCodes + $c.getInt($s));
           |}
           |${ev.value} = $acc;
         """.stripMargin
      })

    override def nullSafeEval(c: Any, t: Any): Any = {
      val codesArr = c.asInstanceOf[ArrayData]
      val tab = t.asInstanceOf[ArrayData]
      val m = codesArr.numElements()
      var acc = 0.0
      var s = 0
      while (s < m) {
        acc += tab.getDouble(s * nCodes + codesArr.getInt(s))
        s += 1
      }
      java.lang.Double.valueOf(acc)
    }

    override protected def withNewChildrenInternal(
        newLeft: Expression, newRight: Expression): AdcSum =
      copy(codes = newLeft, dtab = newRight)
  }

  /** Adjacent whitespace-token bigrams of a text column as
    * space-joined strings ("w1 w2", all positions, duplicates kept) —
    * one pass, equal to
    * `zip_with(slice(tk,1,n-1), slice(tk,2,n-1), (x,y) -> concat(x,' ',y))`
    * over `tk = tokens(text)` (tokens contain no whitespace, so the
    * joined form is bijective with the pair). Backs the repetition
    * and bigram-LM operators' explode without an interpreted lambda
    * per bigram. */
  case class TokenBigrams(child: Expression)
      extends UnaryExpression with ExpectsInputTypes {
    override def inputTypes: Seq[TypeBridge.AbstractType] = Seq(StringType)

    override def dataType: DataType = ArrayType(StringType, containsNull = false)
    override def prettyName: String = "token_bigrams"

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val ref = ctx.addReferenceObj("tokenBigramsExpr", this,
        classOf[TokenBigrams].getName)
      defineCodeGen(ctx, ev, c =>
        s"(org.apache.spark.sql.catalyst.util.ArrayData) $ref.nullSafeEval($c)")
    }

    private def isWs(c: Char): Boolean =
      c == ' ' || c == '\t' || c == '\n' || c == '\u000B' || c == '\f' || c == '\r'

    override def nullSafeEval(input: Any): Any = {
      val s = input.asInstanceOf[UTF8String].toString
      val len = s.length
      val starts = new java.util.ArrayList[Integer]()
      val ends = new java.util.ArrayList[Integer]()
      var i = 0
      while (i < len) {
        while (i < len && isWs(s.charAt(i))) i += 1
        val st = i
        while (i < len && !isWs(s.charAt(i))) i += 1
        if (i > st) { starts.add(st); ends.add(i) }
      }
      val m = starts.size()
      if (m < 2) return new GenericArrayData(Array.empty[Any])
      val out = new Array[Any](m - 1)
      var w = 0
      while (w < m - 1) {
        val sb = new java.lang.StringBuilder(
          ends.get(w) - starts.get(w) + 1 + ends.get(w + 1) - starts.get(w + 1))
        sb.append(s, starts.get(w).intValue(), ends.get(w).intValue())
        sb.append(' ')
        sb.append(s, starts.get(w + 1).intValue(), ends.get(w + 1).intValue())
        out(w) = UTF8String.fromString(sb.toString)
        w += 1
      }
      new GenericArrayData(out)
    }

    override protected def withNewChildInternal(c: Expression): TokenBigrams =
      copy(child = c)
  }

  /** Whole-string polynomial fingerprint (= [[TextFunctions.polyFingerprint]]). */
  case class PolyHash(child: Expression)
      extends UnaryExpression with ExpectsInputTypes {
    override def inputTypes: Seq[TypeBridge.AbstractType] = Seq(StringType)

    override def dataType: DataType = LongType
    override def prettyName: String = "poly_hash"

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, c => {
        val s = ctx.freshName("s"); val h = ctx.freshName("h")
        val i = ctx.freshName("i")
        s"""
           |java.lang.String $s = $c.toString();
           |long $h = 0L;
           |for (int $i = 0; $i < $s.length(); $i++) {
           |  $h = ($h * 31 + $s.charAt($i)) % ${P}L;
           |}
           |${ev.value} = $h;
         """.stripMargin
      })

    override def nullSafeEval(input: Any): Any = {
      val s = input.asInstanceOf[UTF8String].toString
      var h = 0L
      var i = 0
      while (i < s.length) { h = (h * 31 + s.charAt(i)) % P; i += 1 }
      java.lang.Long.valueOf(h)
    }

    override protected def withNewChildInternal(c: Expression): PolyHash =
      copy(child = c)
  }

  def dotProduct(a: Column, b: Column): Column =
    ColumnBridge.column(DotProduct(
      ColumnBridge.expression(a), ColumnBridge.expression(b)))
  def sortedJaccard(a: Column, b: Column): Column =
    ColumnBridge.column(SortedJaccard(
      ColumnBridge.expression(a), ColumnBridge.expression(b)))
  /** Early-abandon jaccard for use under a `jac >= t` filter with the
    * same t; falls back to the exact form when t <= 0 (where the
    * abandon sentinel −1.0 could wrongly pass the filter). */
  def sortedJaccardGeq(a: Column, b: Column, t: Double): Column =
    if (t > 0)
      ColumnBridge.column(SortedJaccardGeq(
        ColumnBridge.expression(a), ColumnBridge.expression(b), t))
    else sortedJaccard(a, b)
  def sortedIntersectCount(a: Column, b: Column): Column =
    ColumnBridge.column(SortedIntersectCount(
      ColumnBridge.expression(a), ColumnBridge.expression(b)))
  def shingleHashes(c: Column, n: Int): Column =
    ColumnBridge.column(ShingleHashes(ColumnBridge.expression(c), n))
  def minHashSig(c: Column): Column =
    ColumnBridge.column(MinHashSig(ColumnBridge.expression(c)))
  def polyHash(c: Column): Column =
    ColumnBridge.column(PolyHash(ColumnBridge.expression(c)))
  def lshProjections(c: Column, nPlanes: Int): Column =
    ColumnBridge.column(LshProjections(ColumnBridge.expression(c), nPlanes))
  def nearestCells(c: Column, centroids: Seq[(Int, Seq[Double])],
      nProbe: Int): Column =
    ColumnBridge.column(NearestCells(ColumnBridge.expression(c),
      centroids, nProbe))
  def cellsWithinRadius(c: Column,
      cells: Seq[(Int, Seq[Double], Double)], radius: Double): Column =
    ColumnBridge.column(CellsWithinRadius(ColumnBridge.expression(c),
      cells, radius))
  def termFreqs(c: Column, terms: Seq[String]): Column =
    ColumnBridge.column(TermFreqs(ColumnBridge.expression(c), terms))
  def tokenHashSet(c: Column): Column =
    ColumnBridge.column(TokenHashSet(ColumnBridge.expression(c)))
  def tokenArray(c: Column): Column =
    ColumnBridge.column(TokenArray(ColumnBridge.expression(c)))
  def tokenNGramHashes(c: Column, n: Int): Column =
    ColumnBridge.column(TokenNGramHashes(ColumnBridge.expression(c), n))
  def tokenNGramXxHashes(c: Column, n: Int): Column =
    ColumnBridge.column(TokenNGramXxHashes(ColumnBridge.expression(c), n))
  def simHash30(c: Column): Column =
    ColumnBridge.column(SimHash30(ColumnBridge.expression(c)))
  def subSquaredDist(emb: Column, cent: Column, sub: Column, dsub: Int): Column =
    ColumnBridge.column(SubSquaredDist(ColumnBridge.expression(emb),
      ColumnBridge.expression(cent), ColumnBridge.expression(sub), dsub))
  def adcSum(codes: Column, dtab: Column, nCodes: Int): Column =
    ColumnBridge.column(AdcSum(ColumnBridge.expression(codes),
      ColumnBridge.expression(dtab), nCodes))
  def pqEncode(c: Column, codebooks: Seq[(Int, Int, Seq[Double])],
      dsub: Int): Column =
    ColumnBridge.column(PqEncode(ColumnBridge.expression(c), codebooks, dsub))
  def pqEncodeResidual(c: Column, centroids: Seq[(Int, Seq[Double])],
      codebooks: Seq[(Int, Int, Seq[Double])], dsub: Int): Column =
    ColumnBridge.column(PqEncodeResidual(ColumnBridge.expression(c),
      centroids, codebooks, dsub))
  def vecSub(a: Column, b: Column): Column =
    ColumnBridge.column(VecSub(ColumnBridge.expression(a),
      ColumnBridge.expression(b)))
  def adcDirectDist(res: Column, codes: Column,
      codebooks: Seq[(Int, Int, Seq[Double])], dsub: Int): Column =
    ColumnBridge.column(AdcDirectDist(ColumnBridge.expression(res),
      ColumnBridge.expression(codes), codebooks, dsub))
  def tokenBigrams(c: Column): Column =
    ColumnBridge.column(TokenBigrams(ColumnBridge.expression(c)))
}
