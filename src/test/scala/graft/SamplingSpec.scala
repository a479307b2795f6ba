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

  test("domainQuota keeps each domain's quota lowest ids, identical to " +
      "the single-window model, for any shard count") {
    val rows = (for {
      d <- Seq("a.com", "b.org", "hot.net")
      i <- 1L to (if (d == "hot.net") 200L else 7L)
    } yield (d, d.hashCode.toLong * 1000 + i)).toDF("domain", "id")
    val naive = rows.withColumn("rn",
        row_number().over(org.apache.spark.sql.expressions.Window
          .partitionBy(col("domain")).orderBy(col("id"))))
      .filter(col("rn") <= 5).drop("rn")
      .as[(String, Long)].collect().toSet
    for (shards <- Seq(1, 4, 64)) {
      val got = Sampling.domainQuota(rows, "domain", "id", 5, shards)
        .as[(String, Long)].collect().toSet
      assert(got == naive, s"shards=$shards")
    }
    // quota larger than any domain keeps everything
    assert(Sampling.domainQuota(rows, "domain", "id", 1000).count()
      == rows.count())
  }
}
