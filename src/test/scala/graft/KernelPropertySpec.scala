package graft

import org.scalacheck.{Gen, Properties}
import org.scalacheck.Prop.forAll
import org.apache.spark.sql.catalyst.expressions.Literal
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, LongType, StringType}
import graft.functions.{FirstEqualIndex, MinHashSignature, SimHash64, SortedJaccard}

/** ScalaCheck properties for the native LSH/dedup kernels, evaluated
  * through the interpreted expression path with `Literal` children (the
  * codegen path is pinned separately by the bit-parity specs).
  */
object KernelProps extends Properties("LshKernels") {

  private def strArr(a: Seq[String]) = Literal.create(a, ArrayType(StringType))
  private def longArr(a: Seq[Long]) = Literal.create(a, ArrayType(LongType))

  private val tokens: Gen[List[String]] =
    Gen.listOfN(30, Gen.oneOf("a", "b", "cc", "dog", "x1", "word", "ñ", "zz"))

  private def sigOf(ts: Seq[String], k: Int = 16): Seq[Long] =
    MinHashSignature(strArr(ts), k).eval(null)
      .asInstanceOf[ArrayData].toLongArray().toSeq

  property("minhash signature is token-order invariant") = forAll(tokens) { ts =>
    ts.isEmpty || sigOf(ts) == sigOf(scala.util.Random.shuffle(ts))
  }

  property("minhash of a union is the elementwise min") =
    forAll(tokens, tokens) { (a, b) =>
      (a.isEmpty || b.isEmpty) ||
        sigOf(a ++ b) == sigOf(a).zip(sigOf(b)).map { case (x, y) => math.min(x, y) }
    }

  property("simhash is token-order invariant and duplication stable") =
    forAll(tokens.suchThat(_.nonEmpty)) { ts =>
      def sh(x: Seq[String]): Long =
        SimHash64(strArr(x)).eval(null).asInstanceOf[Long]
      sh(ts) == sh(scala.util.Random.shuffle(ts)) && sh(ts) == sh(ts ++ ts)
    }

  private val hashSet: Gen[List[Long]] =
    Gen.listOf(Gen.chooseNum(-1000L, 1000L)).map(_.distinct.sorted)

  property("sorted jaccard equals set-arithmetic jaccard") =
    forAll(hashSet, hashSet) { (a, b) =>
      (a.isEmpty && b.isEmpty) || {
        val got = SortedJaccard(longArr(a), longArr(b)).eval(null)
          .asInstanceOf[Double]
        val inter = a.toSet.intersect(b.toSet).size
        val expected = inter.toDouble / (a.size + b.size - inter)
        got == expected
      }
    }

  private val grammarRegex =
    "[+-]?(\\d+(\\.\\d*)?|\\.\\d+)([eE][+-]?\\d+)?".r.pattern

  property("hand-rolled grammar scan equals the regex it replaced") =
    forAll(Gen.oneOf(
      Gen.asciiPrintableStr.map(_.take(12)),
      Gen.listOfN(8, Gen.oneOf("1", "23", "+", "-", ".", "e", "E", ""))
        .map(_.mkString))) { s =>
      graft.functions.LocaleNum.validGrammar(s) ==
        grammarRegex.matcher(s).matches()
    }

  property("first equal index matches zip-indexWhere") =
    forAll(Gen.listOfN(16, Gen.chooseNum(0L, 3L)),
      Gen.listOfN(16, Gen.chooseNum(0L, 3L))) { (a, b) =>
      val got = FirstEqualIndex(longArr(a), longArr(b)).eval(null)
        .asInstanceOf[Int]
      got == a.zip(b).indexWhere { case (x, y) => x == y }
    }
}
