package graft

import org.apache.spark.sql.functions._

import graft.operators.Corpus

class CorpusSpec extends SparkSpec {
  import spark.implicits._

  private val docs = Seq(
    (1L, "the quick brown fox jumps over the lazy dog again and again"),
    (2L, "the quick brown fox jumps over the lazy dog again and again"),
    (3L, "the quick brown fox jumps over the lazy cat again and again"),
    (4L, "completely different content about spark query engines at scale"),
    (5L, "the quick brown fox jumps over the lazy dog again and again ")
  ).toDF("doc_id", "text")

  test("clean drops exact dups and whitespace variants, keeps a " +
      "representative per cluster, respects the quality floor") {
    val kept = Corpus.clean(docs, "doc_id", "text",
        minQuality = 0.0, langs = Seq("en", "und"))
      .select("doc_id").as[Long].collect().toSet
    // 2 is byte-identical to 1; 5 normalizes to 1's fingerprint
    assert(!kept.contains(2L) && !kept.contains(5L))
    // each surviving cluster keeps its min id; 4 is untouched
    assert(kept.contains(1L) && kept.contains(4L))
    assert(kept.subsetOf(Set(1L, 3L, 4L)))
    // an impossible quality floor rejects everything
    assert(Corpus.clean(docs, "doc_id", "text", minQuality = 2.0,
      langs = Seq("en", "und")).count() == 0)
  }

  test("language allowlist filters: non-matching and empty allowlists " +
      "both keep nothing") {
    assert(Corpus.clean(docs, "doc_id", "text", 0.0, Seq("fr")).count() == 0)
    assert(Corpus.clean(docs, "doc_id", "text", 0.0, Seq.empty).count() == 0)
  }

  test("junk rows are rejected, not fatal: empty and whitespace-only " +
      "text pass through the quality filter as rejects under ANSI mode") {
    val junk = docs.union(Seq((6L, ""), (7L, "   ")).toDF("doc_id", "text"))
    val kept = Corpus.clean(junk, "doc_id", "text",
        minQuality = 0.0, langs = Seq("en", "und"))
      .select("doc_id").as[Long].collect().toSet
    // minQuality 0.0: even junk scores 0 >= 0, but must not crash;
    // a positive floor rejects it
    assert(Corpus.clean(junk, "doc_id", "text", 0.01, Seq("en", "und"))
      .select("doc_id").as[Long].collect().toSet.intersect(Set(6L, 7L)).isEmpty)
    assert(kept.contains(1L) || kept.contains(4L))
  }

  test("scrubPii redacts every class and composes with clean") {
    val pii = Seq(
      (1L, "the cat sat on the mat email bob.smith+x@ex-ample.co.uk ok"),
      (2L, "the dog sat card 4024 0071 5336 1885 and ip 192.168.0.254 " +
        "call 415-555-2671 done"),
      (3L, "the cow sat on the mat with no personal data at all here")
    ).toDF("doc_id", "text")
    val out = pii.select(col("doc_id"),
        Corpus.scrubPii(col("text")).as("t"))
      .as[(Long, String)].collect().toMap
    assert(out(1L) == "the cat sat on the mat email <EMAIL> ok")
    assert(out(2L) == "the dog sat card <CC> and ip <IP> call <PHONE> done")
    assert(out(3L) == pii.filter(col("doc_id") === 3).
      select("text").as[String].head())
    // composition: scrub AFTER hygiene keeps the pipeline shape —
    // clean's output still scrubs (column fn applies to any stage)
    val cleaned = Corpus.clean(pii, "doc_id", "text",
      minQuality = 0.0, langs = Seq("en", "und"))
    val scrubbed = cleaned.select(col("doc_id"),
      Corpus.scrubPii(col("text")).as("text"))
    assert(scrubbed.filter(col("text").rlike(
      "[A-Za-z0-9._%+-]+@")).count() == 0)
  }

  test("cleanKeepBest keeps the highest-quality cluster member, " +
      "ties to lowest id, singletons untouched") {
    // docs 1 and 2 tokenize identically except doc 2 carries extra
    // high-quality prose -> same cluster, 2 wins on quality
    val near = Seq(
      (1L, "the quick brown fox jumps over the lazy dog again and again"),
      (2L, "the quick brown fox jumps over the lazy dog again and again " +
        "with more of the fine prose that raises the stopword ratio"),
      (4L, "completely different content about spark query engines at scale")
    ).toDF("doc_id", "text")
    val minKept = Corpus.clean(near, "doc_id", "text", 0.0, Seq("en", "und"))
      .select("doc_id").as[Long].collect().toSet
    val bestKept = Corpus.cleanKeepBest(near, "doc_id", "text",
        0.0, Seq("en", "und"))
      .select("doc_id").as[Long].collect().toSet
    assert(minKept.contains(4L) && bestKept.contains(4L))
    // if 1 and 2 clustered, clean keeps 1 but cleanKeepBest keeps 2
    if (!minKept.contains(2L)) {
      assert(minKept.contains(1L))
      assert(bestKept.contains(2L) && !bestKept.contains(1L))
    }
    // identical-quality clusters fall back to min id: byte-identical
    // texts collapse in the exact stage and stay deterministic
    val dup = Seq((7L, "same text here"), (9L, "same text here"))
      .toDF("doc_id", "text")
    assert(Corpus.cleanKeepBest(dup, "doc_id", "text", 0.0,
      Seq("en", "und")).select("doc_id").as[Long].collect().toSeq == Seq(7L))
  }

  test("budgetSelect: greedy quality-first prefix fill, ties by id, " +
      "boundary doc and everything after it dropped") {
    val d = Seq(
      (1L, 0.9, 40L),  // best: cum 40, keep
      (2L, 0.5, 30L),  // tie group with 3, lower id first: cum 70, keep
      (3L, 0.5, 30L),  // cum 100, keep (== budget exactly)
      (4L, 0.3, 10L),  // cum 110 > 100: drop
      (5L, 0.1, 1L)    // cum 111: drop (prefix semantics, not knapsack)
    ).toDF("doc_id", "q", "n_tok")
    val got = Corpus.budgetSelect(d, "doc_id", "q", "n_tok", 100L)
      .select($"doc_id", $"cum_tok", $"keep")
      .as[(Long, Long, Boolean)].collect().toSeq
    assert(got == Seq((1L, 40L, true), (2L, 70L, true), (3L, 100L, true),
      (4L, 110L, false), (5L, 111L, false)))
  }

  test("budgetSelect with NEAR-UNIQUE float quality: matches the " +
      "single-window model and plans no corpus-wide window — the only " +
      "unpartitioned windows run over the per-bucket totals frame") {
    val n = 5000
    // deterministic near-unique doubles (sin is injective enough here:
    // n distinct qualities), the raw-classifier-margin shape that made
    // the r14 histogram decomposition corpus-sized
    val d = spark.range(n.toLong).select(
      col("id"),
      sin(col("id").cast("double")).as("q"),
      (col("id") % 7 + 1L).as("n_tok"))
    val budget = 3L * n / 2
    val got = Corpus.budgetSelect(d, "id", "q", "n_tok", budget)
    // plan contract: any window with an EMPTY partition spec must sit
    // over the per-bucket totals aggregate (≤ buckets rows), never
    // over the corpus-derived frame
    val globals = got.queryExecution.sparkPlan.collect {
      case w: org.apache.spark.sql.execution.window.WindowExec
          if w.partitionSpec.isEmpty => w
    }
    assert(globals.nonEmpty, "expected the offsets window in the plan")
    globals.foreach { w =>
      assert(w.child.toString.contains("__tot"),
        s"unpartitioned window not over bucket totals:\n$w")
    }
    val rows = got.select($"id", $"cum_tok", $"keep")
      .as[(Long, Long, Boolean)].collect()
    assert(rows.length == n)
    // model: running sum in (q desc, id) order
    val qv = (0 until n).map(i => (i.toLong, math.sin(i.toDouble),
      i % 7 + 1L))
    var acc = 0L
    val model = qv.sortBy { case (id, q, _) => (-q, id) }.map {
      case (id, _, t) => acc += t; (id, acc, acc <= budget) }
      .map(r => r._1 -> ((r._2, r._3))).toMap
    rows.foreach { case (id, cum, keep) =>
      assert(model(id) == ((cum, keep)), s"id=$id")
    }
  }

  test("paragraphDedup: first occurrence wins corpus-wide, within-doc " +
      "repeats drop, empty-key separators always survive, reassembly " +
      "preserves position order") {
    val d = Seq(
      (1L, "Shared Header\nunique one\n\nShared Header\nbody A"),
      (2L, "shared header!!\nunique two\n\n123 ---\nbody B"),
      (3L, "BODY a\nunique three")
    ).toDF("doc_id", "text")
    val got = Corpus.paragraphDedup(d, "doc_id", "text")
      .orderBy($"doc_id")
      .as[(Long, String, Long, Long)].collect().toSeq
    // doc 1 keeps its header (first occurrence), loses the pos-3
    // within-doc repeat, keeps the blank separator
    assert(got(0) == ((1L, "Shared Header\nunique one\n\nbody A", 5L, 4L)))
    // doc 2's header normalizes to doc 1's key ("shared header!!" →
    // "shared header") and drops; "123 ---" normalizes to EMPTY and
    // is kept unconditionally
    assert(got(1) == ((2L, "unique two\n\n123 ---\nbody B", 5L, 4L)))
    // "BODY a" collides with doc 1's "body A" (case-folded) and drops
    assert(got(2) == ((3L, "unique three", 2L, 1L)))
  }

  test("paragraphDedup: a document whose every paragraph loses still " +
      "appears with empty text and n_kept = 0") {
    val d = Seq((1L, "only para"), (2L, "Only Para!")).toDF("doc_id", "text")
    val got = Corpus.paragraphDedup(d, "doc_id", "text")
      .orderBy($"doc_id")
      .as[(Long, String, Long, Long)].collect().toSeq
    assert(got == Seq((1L, "only para", 1L, 1L), (2L, "", 1L, 0L)))
  }

  test("scrubInvisible removes every class — C0+DEL, C1, zero-width, " +
      "bidi — counts them per class, and is idempotent") {
    // escapes, not raw bytes: test source stays ASCII-greppable
    val dirty = "a\u0001b\u007Fc \u0085d\u009Ce " +
      "f\u200Bg\u200Dh\uFEFFi\u00ADj k\u202El\u2066m"
    val d = Seq((1L, dirty), (2L, "clean text only")).toDF("doc_id", "t")
    val got = d.select(col("doc_id"),
        Corpus.scrubInvisible(col("t")).as("c"),
        struct(Corpus.invisibleCounts(col("t")): _*).as("n"))
      .orderBy($"doc_id").collect()
    assert(got(0).getString(1) == "abc de fghij klm")
    val n = got(0).getStruct(2)
    assert((n.getLong(0), n.getLong(1), n.getLong(2), n.getLong(3)) ==
      ((2L, 2L, 4L, 2L)))
    assert(got(1).getString(1) == "clean text only")
    assert(got(1).getStruct(2).toSeq == Seq(0L, 0L, 0L, 0L))
    // idempotent: scrubbing clean output changes nothing
    val again = d.select(Corpus.scrubInvisible(
      Corpus.scrubInvisible(col("t"))).as("c2")).orderBy($"c2")
    assert(again.as[String].collect().toSet ==
      Set("abc de fghij klm", "clean text only"))
  }

  test("paragraphDedup: paraKey normalization — case, digits, " +
      "punctuation and whitespace runs are identities; distinct words " +
      "are not collapsed") {
    val d = Seq(
      (1L, "Promo   Block a"), (2L, "promo block 42 a!!"),
      (3L, "promo block b")
    ).toDF("doc_id", "text")
    val got = Corpus.paragraphDedup(d, "doc_id", "text")
      .orderBy($"doc_id")
      .as[(Long, String, Long, Long)].collect().toSeq
    assert(got(0)._2 == "Promo   Block a" && got(1)._2 == ""
      && got(2)._2 == "promo block b")
  }
}
