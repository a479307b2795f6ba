package graft

import org.apache.spark.sql.functions._

import graft.operators.Packing

class PackingSpec extends SparkSpec {
  import spark.implicits._

  test("assignPacks equals the sequential model regardless of bucket size") {
    // sparse, unordered-insert ids with varied token counts
    val rows = Seq((3L, 10L), (10L, 50L), (90L, 200L), (91L, 5L),
      (4000L, 100L), (4100L, 300L), (9000L, 1L), (9001L, 256L))
    val df = rows.toDF("doc_id", "n_tokens")
    // sequential ground truth: exclusive running sum div budget
    val expected = rows.sortBy(_._1)
      .scanLeft((0L, 0L, 0L)) { case ((_, _, cum), (id, n)) => (id, n, cum + n) }
      .drop(1)
      .map { case (id, n, cumIncl) => id -> (cumIncl - n) / 256L }
      .toMap
    for (nBuckets <- Seq(1, 2, 7, 64)) {
      val got = Packing.assignPacks(df, "doc_id", "n_tokens", 256L, nBuckets)
        .select("doc_id", "pack_id").as[(Long, Long)].collect().toMap
      assert(got == expected, s"nBuckets=$nBuckets")
    }
  }

  test("sparse 60-bit hash ids do not degrade the bucket frame") {
    // ids drawn from a huge sparse space: value-range bucketing would
    // make ~1 bucket per row; rank-based ranges must keep pack ids
    // equal to the sequential model regardless
    val rows = Seq(7L, 1L << 58, (1L << 59) + 3, 12345678901L, 42L,
      (1L << 57) - 11, 999999999999999L, 3L)
      .distinct.map(id => (id, id % 97 + 1))
    val df = rows.toDF("doc_id", "n_tokens")
    val expected = rows.sortBy(_._1)
      .scanLeft((0L, 0L, 0L)) { case ((_, _, cum), (id, n)) => (id, n, cum + n) }
      .drop(1)
      .map { case (id, n, cumIncl) => id -> (cumIncl - n) / 128L }
      .toMap
    val got = Packing.assignPacks(df, "doc_id", "n_tokens", 128L, 4)
      .select("doc_id", "pack_id").as[(Long, Long)].collect().toMap
    assert(got == expected)
  }

  test("packManifest totals cover every doc exactly once") {
    val df = (1L to 100L).map(i => (i, i % 7 + 1)).toDF("doc_id", "n_tokens")
    val assigned = Packing.assignPacks(df, "doc_id", "n_tokens", 64L)
    val m = Packing.packManifest(assigned, "doc_id", "n_tokens")
    val (docs, toks) = m.agg(sum("n_docs"), sum("n_tokens"))
      .as[(Long, Long)].head()
    assert(docs == 100L)
    assert(toks == (1L to 100L).map(_ % 7 + 1).sum)
    // pack ids are contiguous from 0
    val ids = m.select("pack_id").as[Long].collect().sorted
    assert(ids.head == 0L && ids.toSeq == (0L until ids.length).toSeq)
  }

  test("empty input yields no packs") {
    val empty = Seq.empty[(Long, Long)].toDF("doc_id", "n_tokens")
    assert(Packing.assignPacks(empty, "doc_id", "n_tokens", 256L).count() == 0)
  }

  test("weightedInterleave: 2:1 weights give exactly 2:1 read order") {
    import graft.operators.Mixing
    val a = (1L to 20L).toDF("doc_id")
    val b = (101L to 120L).toDF("doc_id")
    val mixed = Mixing.weightedInterleave(
        Seq(("a", a, 2.0), ("b", b, 1.0)), "doc_id", nBuckets = 3)
      .orderBy(col("mix_key"), col("source"), col("doc_id"))
      .select("source").as[String].collect()
    // keys: a -> (r+0.5)/2 (0.25, 0.75, 1.25, ...), b -> r+0.5
    // (0.5, 1.5, ...): among the first 15 reads, 10 a's and 5 b's
    val first15 = mixed.take(15)
    assert(first15.count(_ == "a") == 10 && first15.count(_ == "b") == 5)
    // deterministic across runs
    val again = Mixing.weightedInterleave(
        Seq(("a", a, 2.0), ("b", b, 1.0)), "doc_id", nBuckets = 3)
      .orderBy(col("mix_key"), col("source"), col("doc_id"))
      .select("source").as[String].collect()
    assert(mixed.toSeq == again.toSeq)
  }

  test("slidingChunks: stride windows, short trailing chunk, " +
      "short doc = one chunk") {
    val docs = Seq(
      (1L, (1 to 10).map(i => s"t$i").mkString(" ")), // 10 tokens
      (2L, "a b")                                     // 2 tokens
    ).toDF("doc_id", "text")
    val got = Packing.slidingChunks(docs, "doc_id", "text",
        chunkSize = 8, overlap = 4)
      .orderBy(col("doc_id"), col("chunk_id"))
      .select("doc_id", "chunk_id", "start_tok", "n_tokens")
      .as[(Long, Long, Long, Long)].collect().toSeq
    // doc 1: starts at 1 and 5 (stride 4); the second window is
    // truncated to the 6 remaining tokens. doc 2: one short chunk.
    assert(got == Seq(
      (1L, 0L, 1L, 8L), (1L, 1L, 5L, 6L),
      (2L, 0L, 1L, 2L)))
    // every chunk digest matches the md5 of its joined token slice
    val md5s = Packing.slidingChunks(docs, "doc_id", "text", 8, 4)
      .filter(col("doc_id") === 1L && col("chunk_id") === 1L)
      .select("chunk_md5").as[String].head()
    val want = java.security.MessageDigest.getInstance("MD5")
      .digest((5 to 10).map(i => s"t$i").mkString(" ").getBytes("UTF-8"))
      .map(b => f"$b%02x").mkString
    assert(md5s == want)
  }

  test("fimTransform: lossless split at stable cuts, both formats " +
      "appear over many docs, short docs pass through as 'none'") {
    import graft.operators.Packing
    val docs = (1L to 50L)
      .map(i => (i, if (i == 7) "tiny" else s"document number $i with " +
        s"enough characters to split meaningfully ${i * 31}"))
      .toDF("doc_id", "text")
    val got = Packing.fimTransform(docs, "doc_id", "text")
      .join(docs, Seq("doc_id"))
      .as[(Long, String, Long, Long, String, String)].collect()
    val modes = got.map(_._2).toSet
    assert(modes == Set("psm", "spm", "none"))
    got.foreach { case (id, mode, c1, c2, fim, orig) =>
      if (mode == "none") {
        assert(id == 7L && fim == "tiny" && c1 == -1L && c2 == -1L)
      } else {
        assert(c1 >= 1 && c1 <= c2 && c2 < orig.length)
        val (pre, mid, suf) = (orig.substring(0, c1.toInt),
          orig.substring(c1.toInt, c2.toInt), orig.substring(c2.toInt))
        val want = if (mode == "psm") s"<PRE>$pre<SUF>$suf<MID>$mid"
          else s"<SUF>$suf<PRE>$pre<MID>$mid"
        assert(fim == want, s"doc $id: $fim != $want")
      }
    }
    // deterministic
    val again = Packing.fimTransform(docs, "doc_id", "text")
      .orderBy($"doc_id").collect().toSeq
    assert(again == Packing.fimTransform(docs, "doc_id", "text")
      .orderBy($"doc_id").collect().toSeq)
  }

  test("spanCorrupt: consecutive sentinels, token conservation, " +
      "high/zero corruption rates behave, deterministic") {
    import graft.operators.Packing
    val docs = (1L to 30L)
      .map(i => (i, (1 to 25).map(t => s"w${i}t$t").mkString(" ")))
      .toDF("doc_id", "text")
    // corruptPct=100: every block corrupted — input is ONLY sentinels,
    // numbered consecutively; target carries every token
    val all = Packing.spanCorrupt(docs, "doc_id", "text",
        blockTokens = 6, corruptPct = 100)
      .as[(Long, Long, Long, String, String)].collect()
    all.foreach { case (_, nb, nc, input, target) =>
      assert(nb == 5 && nc == 5) // ceil(25/6) = 5 blocks
      assert(input == (0 until 5).map(k => s"<extra_id_$k>").mkString(" "))
      assert(target.split(" ").count(_.startsWith("<extra_id_")) == 5)
      assert(target.split(" ").length == 5 + 25)
    }
    // corruptPct=0: identity input, empty target
    val none = Packing.spanCorrupt(docs, "doc_id", "text",
        blockTokens = 6, corruptPct = 0)
      .as[(Long, Long, Long, String, String)].collect()
    none.foreach { case (id, _, nc, input, target) =>
      assert(nc == 0 && target == "")
      assert(input == (1 to 25).map(t => s"w${id}t$t").mkString(" "))
    }
    // default 15%: conservation per doc + determinism
    val a = Packing.spanCorrupt(docs, "doc_id", "text")
      .orderBy($"doc_id")
      .as[(Long, Long, Long, String, String)].collect().toSeq
    a.foreach { case (_, _, nc, input, target) =>
      val tgtToks = if (target.isEmpty) 0 else target.split(" ").length
      assert(input.split(" ").length + tgtToks == 25 + 2 * nc)
    }
    val b = Packing.spanCorrupt(docs, "doc_id", "text")
      .orderBy($"doc_id")
      .as[(Long, Long, Long, String, String)].collect().toSeq
    assert(a == b)
  }

  test("unimaxAllocate: waterfill caps small domains at maxEpochs and " +
      "levels the rest; budget is spent exactly when any domain is " +
      "uncapped") {
    import graft.operators.Mixing
    val dt = Seq(("a", 10L), ("b", 50L), ("c", 200L), ("d", 300L))
      .toDF("domain", "n_tok")
    val got = Mixing.unimaxAllocate(dt, "domain", "n_tok",
        budgetTokens = 300L, maxEpochs = 2.0)
      .select($"domain", $"alloc", $"epochs")
      .as[(String, Double, Double)].collect().map(r => r._1 -> r).toMap
    // a: cap 20 <= 300/4 -> capped at 2 epochs
    assert(got("a")._2 == 20.0 && got("a")._3 == 2.0)
    // b: cap 100 > (300-20)/3 = 93.33 -> water level
    val lambda = (300.0 - 20.0) / 3.0
    assert(got("b")._2 == lambda && got("c")._2 == lambda
      && got("d")._2 == lambda)
    assert(math.abs(got.values.map(_._2).sum - 300.0) < 1e-9)
    // epochs never exceed the bound
    assert(got.values.forall(_._3 <= 2.0))
  }

  test("unimaxAllocate: a budget above the global cap leaves every " +
      "domain capped (and the budget unspent); unimaxApply repeats " +
      "whole epochs and samples the fractional one deterministically") {
    import graft.operators.Mixing
    val dt = Seq(("a", 10L), ("b", 50L)).toDF("domain", "n_tok")
    val all = Mixing.unimaxAllocate(dt, "domain", "n_tok", 10000L, 2.0)
      .select($"domain", $"alloc").as[(String, Double)].collect().toMap
    assert(all == Map("a" -> 20.0, "b" -> 100.0))

    val docs = (1L to 400L)
      .map(i => (i, if (i <= 200) "full" else "frac"))
      .toDF("doc_id", "domain")
    val alloc = Seq(("full", 100L, 200.0, 200.0, 2.0),
        ("frac", 100L, 200.0, 150.0, 1.5))
      .toDF("domain", "n_tok", "cap", "alloc", "epochs")
    val reps = Mixing.unimaxApply(docs, "doc_id", "domain", alloc)
      .select($"doc_id", $"reps").as[(Long, Long)].collect().toMap
    assert((1L to 200L).forall(reps(_) == 2L))
    val fracReps = (201L to 400L).map(reps)
    assert(fracReps.forall(r => r == 1L || r == 2L))
    // ~half of the fractional domain gets the extra epoch
    val extra = fracReps.count(_ == 2L)
    assert(extra > 60 && extra < 140, s"expected ~100 extras, got $extra")
    // deterministic re-run
    val again = Mixing.unimaxApply(docs, "doc_id", "domain", alloc)
      .select($"doc_id", $"reps").as[(Long, Long)].collect().toMap
    assert(again == reps)
  }
}
