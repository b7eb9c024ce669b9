package graft.operators

import org.apache.spark.unsafe.hash.Murmur3_x86_32
import org.apache.spark.unsafe.types.UTF8String

import graft.SparkSpec

class LogRegTrainSpec extends SparkSpec {

  import spark.implicits._

  private val docs = Seq(
    (1L, "spark shuffle partition broadcast join", true),
    (2L, "spark codegen catalyst expression plan", true),
    (3L, "spark partition broadcast catalyst plan", true),
    (4L, "banana mango papaya guava lychee", false),
    (5L, "mango guava banana lychee papaya", false),
    (6L, "papaya lychee guava mango banana", false),
    (7L, "spark broadcast plan", true),
    (8L, "guava banana", false)
  ).toDF("doc_id", "text", "label")

  /** Plain-Scala replica of the distributed quantized full-batch GD —
    * same bucketing, same milli quantization, same IEEE update order. */
  private def localFit(rows: Seq[(String, Double)], d: Int, epochs: Int,
                       lr: Double): (Double, Array[Double]) = {
    def buckets(text: String): Seq[Int] =
      text.trim.toLowerCase.split("\\s+").filter(_.nonEmpty).toSeq.map { t =>
        val u = UTF8String.fromString(t)
        val h = Murmur3_x86_32.hashUnsafeBytes(u.getBaseObject,
          u.getBaseOffset, u.numBytes(), 42)
        ((h.toLong & 0xffffffffL) % d).toInt
      }
    var bias = 0.0
    var w = Array.fill(d)(0.0)
    val n = rows.size.toDouble
    for (_ <- 0 until epochs) {
      val gs = new Array[Long](d)
      var gb = 0L
      rows.foreach { case (text, y) =>
        var z = bias
        val bs = buckets(text)
        bs.foreach(b => z += w(b))
        val p = 1.0 / (1.0 + math.exp(-z))
        val gm = BigDecimal((p - y) * 1000.0)
          .setScale(0, BigDecimal.RoundingMode.HALF_UP).toLong
        gb += gm
        bs.foreach(b => gs(b) += gm)
      }
      bias -= lr * ((gb.toDouble / 1000.0) / n)
      val prev = w
      w = Array.tabulate(d)(i => prev(i) - lr * ((gs(i).toDouble / 1000.0) / n))
    }
    (bias, w)
  }

  test("distributed fit equals the local full-batch replica exactly") {
    val m = LogRegTrain.fit(docs, "text", "label", d = 16, epochs = 4,
      lr = 0.5)
    val (eb, ew) = localFit(
      docs.select("text", "label").collect()
        .map(r => (r.getString(0), if (r.getBoolean(1)) 1.0 else 0.0)).toSeq,
      d = 16, epochs = 4, lr = 0.5)
    assert(m.bias == eb)
    assert(m.weights.toSeq == ew.toSeq)
  }

  test("training reduces log-loss and separates the classes") {
    val m0 = LogRegTrain.Model(0.0, Array.fill(16)(0.0))
    val m = LogRegTrain.fit(docs, "text", "label", d = 16, epochs = 6,
      lr = 0.5)
    val l0 = LogRegTrain.logLoss(docs, "text", "label", m0)
    val l = LogRegTrain.logLoss(docs, "text", "label", m)
    assert(l < l0, s"log-loss did not improve: $l >= $l0")
    // every training doc lands on the correct side of the boundary
    val scored = LogRegTrain
      .modelFrame(spark, m)   // smoke the frame surface too
    assert(scored.count() == 17)
    val sep = docs.collect().forall { r =>
      val (eb, ew) = (m.bias, m.weights)
      var z = eb
      r.getString(1).trim.toLowerCase.split("\\s+").filter(_.nonEmpty)
        .foreach { t =>
          val u = UTF8String.fromString(t)
          val h = Murmur3_x86_32.hashUnsafeBytes(u.getBaseObject,
            u.getBaseOffset, u.numBytes(), 42)
          z += ew(((h.toLong & 0xffffffffL) % 16).toInt)
        }
      (z > 0) == r.getBoolean(2)
    }
    assert(sep, "trained model misclassifies a training doc")
  }

  test("null text rows are ignored; zero epochs returns the zero model") {
    val withNull = docs.union(
      Seq((9L, null.asInstanceOf[String], true)).toDF("doc_id", "text",
        "label"))
    val a = LogRegTrain.fit(withNull, "text", "label", d = 16, epochs = 2,
      lr = 0.5)
    val b = LogRegTrain.fit(docs, "text", "label", d = 16, epochs = 2,
      lr = 0.5)
    assert(a.bias == b.bias && a.weights.toSeq == b.weights.toSeq)
    val z = LogRegTrain.fit(docs, "text", "label", d = 16, epochs = 0,
      lr = 0.5)
    assert(z.bias == 0.0 && z.weights.forall(_ == 0.0))
  }
}
