package graft

import org.scalacheck.{Gen, Properties}
import org.scalacheck.Prop.forAll
import org.apache.spark.sql.catalyst.expressions.Literal
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, LongType}
import graft.functions.{MinhashOfHashes, PortableHash, SignBucketsOfQuantized, SimhashOfHashes}
import graft.text.Dedup
import graft.ml.Similarity

/** ScalaCheck properties for the native hash expressions' interpreted
  * eval path, checked against independent Scala models (the codegen path
  * is pinned by MinhashSpec/SimhashSpec through real Spark jobs). No
  * SparkSession needed: expressions evaluate over Literal array children.
  */
object HashExprProps extends Properties("HashExpressions") {

  private val P = PortableHash.P
  private val hashGen = Gen.chooseNum(0L, 1L << 52)
  private val arrGen = Gen.listOf(hashGen)

  private def evalExpr(e: org.apache.spark.sql.catalyst.expressions.Expression): Any =
    e.eval(null)

  private def litArr(hs: Seq[Long]): Literal =
    Literal.create(new GenericArrayData(hs.toArray), ArrayType(LongType))

  private def minhashModel(hs: Seq[Long]): Seq[Option[Long]] =
    Dedup.perms.map { case (a, b) =>
      if (hs.isEmpty) None
      else Some(hs.map(h => ((h % P) * a + b) % P).min)
    }

  private def simhashModel(hs: Seq[Long]): Long = {
    val n = hs.size
    var sim = 0L
    for (((a, b), p) <- Dedup.simPerms.zipWithIndex; j <- 0 until 16) {
      val ones = hs.count(h => ((((h % P) * a + b) % P) >>> j & 1L) == 1L)
      if (2L * ones > n) sim |= 1L << (p * 16 + j)
    }
    sim
  }

  property("minhash eval equals the model") = forAll(arrGen) { hs =>
    val out = evalExpr(MinhashOfHashes(litArr(hs), Dedup.perms))
      .asInstanceOf[ArrayData]
    val got = (0 until out.numElements()).map(i =>
      if (out.isNullAt(i)) None else Some(out.getLong(i)))
    got == minhashModel(hs)
  }

  property("simhash eval equals the model") = forAll(arrGen) { hs =>
    evalExpr(SimhashOfHashes(litArr(hs), Dedup.simPerms)) == simhashModel(hs)
  }

  property("both are order-invariant (sketches of a bag, not a sequence)") =
    forAll(arrGen) { hs =>
      val r = hs.reverse
      evalExpr(SimhashOfHashes(litArr(hs), Dedup.simPerms)) ==
        evalExpr(SimhashOfHashes(litArr(r), Dedup.simPerms)) &&
      evalExpr(MinhashOfHashes(litArr(hs), Dedup.perms)).toString ==
        evalExpr(MinhashOfHashes(litArr(r), Dedup.perms)).toString
    }

  property("duplicating every element leaves minhash unchanged (set semantics)") =
    forAll(Gen.nonEmptyListOf(hashGen)) { hs =>
      evalExpr(MinhashOfHashes(litArr(hs ++ hs), Dedup.perms)).toString ==
        evalExpr(MinhashOfHashes(litArr(hs), Dedup.perms)).toString
    }

  private def shingleModel(hs: Seq[Long]): Seq[Long] =
    hs.sliding(3).filter(_.size == 3).map { w =>
      (((w(0) % P) * 131L + w(1)) % P * 131L + w(2)) % P
    }.toSeq.distinct

  property("shingles eval equals the model (distinct, first-occurrence order)") =
    forAll(arrGen) { hs =>
      val out = evalExpr(graft.functions.ShinglesOfHashes(litArr(hs)))
        .asInstanceOf[ArrayData]
      (0 until out.numElements()).map(out.getLong) == shingleModel(hs)
    }

  // window-k generalization: the same left-nested ×131 fold at any width
  // (k=3 reduces to shingleModel above — the fold IS shingle3's chain)
  private def shingleModelK(hs: Seq[Long], k: Int): Seq[Long] =
    hs.sliding(k).filter(_.size == k).map(w =>
      w.tail.foldLeft(w.head % P)((acc, h) => (acc * 131L + h) % P)).toSeq.distinct

  property("window-k shingles eval equals the model for k in 1..13") =
    forAll(arrGen, Gen.chooseNum(1, 13)) { (hs, k) =>
      val out = evalExpr(graft.functions.ShinglesOfHashes(litArr(hs), k))
        .asInstanceOf[ArrayData]
      (0 until out.numElements()).map(out.getLong) == shingleModelK(hs, k)
    }

  property("window-3 shingles equal the legacy 3-shingle chain exactly") =
    forAll(arrGen) { hs => shingleModelK(hs, 3) == shingleModel(hs) }

  // --- win_shingles_of_hashes vs the un-deduplicated sliding model -----
  private def winShingleModelK(hs: Seq[Long], k: Int): Seq[Long] =
    hs.sliding(k).filter(_.size == k).map(w =>
      w.tail.foldLeft(w.head % P)((acc, h) => (acc * 131L + h) % P)).toSeq

  property("window-k ordered shingles eval equals the sliding model for k in 1..13") =
    forAll(arrGen, Gen.chooseNum(1, 13)) { (hs, k) =>
      val out = evalExpr(graft.functions.WinShinglesOfHashes(litArr(hs), k))
        .asInstanceOf[ArrayData]
      (0 until out.numElements()).map(out.getLong) == winShingleModelK(hs, k)
    }

  property("ordered shingles dedup to shingles_of_hashes (one fold, two faces)") =
    forAll(arrGen, Gen.chooseNum(1, 13)) { (hs, k) =>
      winShingleModelK(hs, k).distinct == shingleModelK(hs, k)
    }

  // --- blocks_of_hashes vs a grouped-fold model ------------------------
  // non-overlapping tiles: same fold as shingles, stride k, multiset in
  // tile order, trailing partial tile dropped
  private def blockModelK(hs: Seq[Long], k: Int): Seq[Long] =
    hs.grouped(k).filter(_.size == k).map(w =>
      w.tail.foldLeft(w.head % P)((acc, h) => (acc * 131L + h) % P)).toSeq

  property("window-k blocks eval equals the model for k in 1..13") =
    forAll(arrGen, Gen.chooseNum(1, 13)) { (hs, k) =>
      val out = evalExpr(graft.functions.BlocksOfHashes(litArr(hs), k))
        .asInstanceOf[ArrayData]
      (0 until out.numElements()).map(out.getLong) == blockModelK(hs, k)
    }

  property("blocks are every k-th shingle (the tiling is a stride over the sliding fold)") =
    forAll(arrGen, Gen.chooseNum(1, 8)) { (hs, k) =>
      // the un-deduplicated sliding folds at positions 0, k, 2k, … are
      // exactly the tile hashes — pins the two families to ONE fold
      val slide = hs.sliding(k).filter(_.size == k).map(w =>
        w.tail.foldLeft(w.head % P)((acc, h) => (acc * 131L + h) % P)).toSeq
      blockModelK(hs, k) == slide.grouped(k).map(_.head).toSeq
        .take(hs.size / k)
    }

  // --- tok_hashes_of_tokens vs an independent code-point model ---------

  private val pow31s: Array[Long] =
    (0 until 9).scanLeft(1L)((a, _) => a * 31L).toArray.init

  /** Independent model of tokHash: code points (NOT bytes/chars — a
    * 4-byte emoji is one position), first 8 padded with '.' = 46,
    * length term capped at 1e6. */
  private def tokHashModel(s: String): Long = {
    val cps = s.codePoints().toArray
    val first8 = (cps.take(8) ++ Array.fill(math.max(0, 8 - cps.length))(46)).take(8)
    math.min(cps.length.toLong, 1000000L) * pow31s(8) +
      first8.zipWithIndex.map { case (cp, i) => cp.toLong * pow31s(i) }.sum
  }

  // code points across ASCII, BMP (incl. multi-byte), and supplementary
  // planes; the surrogate range is invalid in UTF-8 and excluded
  private val cpGen = Gen.frequency(
    (6, Gen.chooseNum(0x21, 0x7E)),
    (2, Gen.chooseNum(0xA1, 0x2FFF)),
    (1, Gen.chooseNum(0x1F300, 0x1F64F)))
  private val tokGen: Gen[String] = Gen.listOf(cpGen).map(cps =>
    new String(cps.toArray, 0, cps.length))

  private def litStrArr(ts: Seq[String]): Literal =
    Literal.create(new GenericArrayData(
      ts.map(org.apache.spark.unsafe.types.UTF8String.fromString).toArray),
      org.apache.spark.sql.types.ArrayType(org.apache.spark.sql.types.StringType))

  property("tok hashes eval equals the code-point model incl. non-ASCII") =
    forAll(Gen.listOf(tokGen)) { ts =>
      val out = evalExpr(graft.functions.TokHashesOfTokens(litStrArr(ts)))
        .asInstanceOf[ArrayData]
      (0 until out.numElements()).map(out.getLong) == ts.map(tokHashModel)
    }

  // --- tok_hashes_of_text vs lower + regex-split + per-token model -----

  /** Independent model of the fused tokenize+hash: lowercase through the
    * SAME UTF8String method lower() uses, split on the TokenRe's six
    * whitespace chars, hash each run. */
  private def tokTextModel(s: String): Seq[Long] =
    org.apache.spark.unsafe.types.UTF8String.fromString(s)
      .toLowerCase.toString
      .split("[ \t\n\r\f]+").toSeq.filter(_.nonEmpty).map(tokHashModel)

  private val textGen: Gen[String] = Gen.listOf(Gen.frequency(
    (4, tokGen),
    (1, Gen.oneOf(" ", "\t", "\n", "\r", "\f", "", "  ", " \t ")),
    (1, Gen.const("MIXED Case ÜPPER Σ")))) // exercise real lowercasing
    .map(_.mkString)

  property("fused text tok hashes equal the split+hash model incl. case folding") =
    forAll(textGen) { s =>
      val out = evalExpr(graft.functions.TokHashesOfText(Literal.create(
        org.apache.spark.unsafe.types.UTF8String.fromString(s),
        org.apache.spark.sql.types.StringType))).asInstanceOf[ArrayData]
      (0 until out.numElements()).map(out.getLong) == tokTextModel(s)
    }

  // quantized embedding coordinates: |floor(x·1e6)| ≤ 2e6 for |x| ≤ 2
  private val coordGen = Gen.chooseNum(-2000000L, 2000000L)

  private def signBucketsModel(qv: Seq[Long]): Seq[Long] =
    (0 until Similarity.NumTables).map { t =>
      (0 until Similarity.PlanesPerTable).map { j =>
        val (a, b) = Similarity.planeParams(t * Similarity.PlanesPerTable + j)
        val proj = qv.zipWithIndex.map { case (q, i0) =>
          q * ((a * (i0 + 1) + b) % 997L - 498L)
        }.sum
        if (proj >= 0L) 1L << j else 0L
      }.sum
    }

  property("sign buckets eval equals the model (incl. empty = all bits set)") =
    forAll(Gen.listOf(coordGen)) { qv =>
      val out = evalExpr(SignBucketsOfQuantized(litArr(qv),
        Similarity.planeParams, Similarity.NumTables, Similarity.PlanesPerTable))
        .asInstanceOf[ArrayData]
      (0 until out.numElements()).map(out.getLong) == signBucketsModel(qv)
    }
}
