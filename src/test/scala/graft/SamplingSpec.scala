package graft

import org.apache.spark.sql.functions._

import graft.operators.Sampling

class SamplingSpec extends SparkSpec {
  import spark.implicits._

  private val ids = (1L to 1000L).toDF("id")

  test("hashSample is deterministic and roughly proportional") {
    val a = Sampling.hashSample(ids, "id", 10).as[Long].collect().toSet
    val b = Sampling.hashSample(ids, "id", 10).as[Long].collect().toSet
    assert(a == b)
    assert(a.size > 50 && a.size < 200, s"10% of 1000 ~ 100, got ${a.size}")
    // a pct-20 sample is a superset of the pct-10 sample (nested samples)
    val wider = Sampling.hashSample(ids, "id", 20).as[Long].collect().toSet
    assert(a.subsetOf(wider))
  }

  test("assignSplit covers every row, stable as the corpus grows") {
    val split = Sampling.assignSplit(ids, "id", 80, 10)
      .select("id", "split").as[(Long, String)].collect().toMap
    assert(split.size == 1000)
    val counts = split.values.groupBy(identity).view.mapValues(_.size).toMap
    assert(counts.keySet == Set("train", "val", "test"))
    assert(counts("train") > counts("val") && counts("train") > counts("test"))
    // same ids get the same split in a smaller corpus (no rand())
    val sub = Sampling.assignSplit(ids.filter(col("id") <= 100), "id", 80, 10)
      .select("id", "split").as[(Long, String)].collect().toMap
    sub.foreach { case (id, s) => assert(split(id) == s) }
  }
}
