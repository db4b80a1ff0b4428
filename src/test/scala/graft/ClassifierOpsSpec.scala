package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.ops.{ClassifierOps, TextOps}

class ClassifierOpsSpec extends AnyFunSuite {
  lazy val spark = SparkTestBase.spark
  import spark.implicits._

  /** Reference batch perceptron with annealed (>> epoch−1) updates over
    * hashed char-3-gram counts. */
  private def bruteTrain(docs: Seq[(Long, String, String)], epochs: Int,
                         dims: Int, posLang: String)
    : Seq[(Long, Long, Long, Long)] = {
    val feats = docs.map { case (id, lang, text) =>
      val x = new Array[Long](dims)
      TextOps.kgramHashes(text, 3).foreach(h => x((h % dims).toInt) += 1L)
      (id, if (lang == posLang) 1L else -1L, x)
    }
    val w = new Array[Long](dims)
    val out = scala.collection.mutable
      .ArrayBuffer.empty[(Long, Long, Long, Long)]
    for (e <- 1 to epochs) {
      val mis = feats.filter { case (_, y, x) =>
        y * x.zip(w).map { case (a, b) => a * b }.sum <= 0
      }
      val dw = new Array[Long](dims)
      mis.foreach { case (_, y, x) =>
        (0 until dims).foreach(i => dw(i) += y * x(i))
      }
      var deltaAbs = 0L
      (0 until dims).foreach { i =>
        val step = dw(i) >> (e - 1)
        w(i) += step; deltaAbs += math.abs(step)
      }
      out += ((e.toLong, mis.size.toLong, deltaAbs,
        w.zipWithIndex.map { case (v, i) => v * (i + 1) }.sum))
    }
    out.toSeq
  }

  test("perceptron training matches the reference loop exactly and is " +
    "layout-invariant") {
    val rnd = new scala.util.Random(11)
    val words = Vector("alpha", "beta", "gamma", "delta", "epsilon",
      "zeta", "eta", "theta")
    val docs = (0L until 60L).map { i =>
      val lang = if (i % 3 == 0) "en" else "de"
      val text = Seq.fill(12)(words(rnd.nextInt(words.size))).mkString(" ")
      (i, lang, text)
    }
    val df = docs.map { case (id, lang, t) => (id, t, lang) }
      .toDF("doc_id", "text", "lang")
    val expected = bruteTrain(docs, epochs = 6, dims = 64, posLang = "en")
    val got = ClassifierOps.perceptronTrain(df, epochs = 6, dims = 64,
        posLang = "en")
      .as[(Long, Long, Long, Long)].collect().toSeq
    assert(got === expected)
    val got2 = ClassifierOps.perceptronTrain(df.repartition(7),
        epochs = 6, dims = 64, posLang = "en")
      .as[(Long, Long, Long, Long)].collect().toSeq
    assert(got2 === expected)
  }

  test("perceptron drives error to zero on vocabulary-separated classes") {
    // disjoint vocabularies → linearly separable → batch perceptron with
    // annealed steps must reach n_mis = 0 and stay there
    val docs = (0L until 40L).map { i =>
      if (i % 2 == 0) (i, "qqq www eee qqq www", "en")
      else (i, "zzz xxx yyy zzz xxx", "de")
    }
    val df = docs.map { case (id, t, l) => (id, t, l) }
      .toDF("doc_id", "text", "lang")
    val got = ClassifierOps.perceptronTrain(df, epochs = 6, dims = 64,
        posLang = "en")
      .as[(Long, Long, Long, Long)].collect().toSeq
    assert(got.last._2 === 0L)
    assert(got.map(_._2).takeRight(3).forall(_ === 0L))
    assert(got === bruteTrain(
      docs.map { case (id, t, l) => (id, l, t) }, 6, 64, "en"))
  }
}
