package graft

import org.apache.spark.sql.functions._

import graft.queries.{Catalog, CatalogChecks}

/** Catalog-wide mechanized boundary checks (one test per entry):
  *
  *  - no entry returns a DECIMAL column (the comparator convention is
  *    exact decimal arithmetic, double at the boundary), and
  *  - every entry's ORDER BY is a total order over its result at the
  *    spec's SF — tie groups must be bit-identical rows.
  *
  * The sweep runs at GRAFT_CATALOG_SF (default sf0.001 so `sbt test`
  * stays fast); run it once at sf0.01 — the driver's gate SF — before
  * each round's final commit:
  *   GRAFT_CATALOG_SF=sf0.01 sbt "testOnly graft.CatalogSpec"
  */
class CatalogSpec extends SparkSpec {

  private val dir = sf(sys.env.getOrElse("GRAFT_CATALOG_SF", "sf0.001"))

  /** Entries whose final sort is legitimately not name-resolvable by
    * CatalogChecks (computed sort key etc.) — each needs a written
    * justification here instead of a silent skip. Empty is the goal. */
  private val sortShapeExceptions: Map[String, String] = Map.empty

  test("seeded non-total entry FAILS the checker (checker self-test)") {
    import spark.implicits._
    // (k=1) ties with two DIFFERENT payloads: a classic hash-flapper.
    val bad = Seq((1, "a"), (1, "b"), (2, "c")).toDF("k", "v")
      .orderBy(col("k"))
    val badCheck = CatalogChecks.totalOrderCheck(bad)
    assert(badCheck.map(_.keys) == Right(Seq("k")))
    assert(CatalogChecks.totalOrderViolations(
      badCheck.toOption.get.frame.get, Seq("k")) == 1L)
    // identical duplicate rows are NOT a violation (hash-safe)
    val dup = Seq((1, "a"), (1, "a"), (2, "c")).toDF("k", "v")
      .orderBy(col("k"))
    assert(CatalogChecks.totalOrderViolations(dup, Seq("k")) == 0L)
    // the LIMIT trap: post-limit output looks total, but the tied
    // boundary rows pre-limit differ — the checker must look UNDER
    // the limit and flag it
    val cut = Seq((1, "a"), (2, "b"), (2, "c")).toDF("k", "v")
      .orderBy(col("k")).limit(2)
    val cutCheck = CatalogChecks.totalOrderCheck(cut).toOption.get
    assert(CatalogChecks.totalOrderViolations(
      cutCheck.frame.get, cutCheck.keys) == 1L)
    // the LIMIT-BELOW trap (r13 ADVICE): orderBy(k).limit(n).orderBy(k)
    // matches the top Sort with no limit above it, but the limit under
    // it still picks boundary rows pre-limit — the checker must find
    // it and run the tie check on the PRE-limit input
    val resort = Seq((1, "a"), (2, "b"), (2, "c")).toDF("k", "v")
      .orderBy(col("k")).limit(2).orderBy(col("k"))
    val resortCheck = CatalogChecks.totalOrderCheck(resort).toOption.get
    assert(CatalogChecks.totalOrderViolations(
      resortCheck.frame.get, resortCheck.keys) == 1L)
    // a differing inner sort key picks boundary rows the top key can't
    // verify: reported as a shape needing hand justification
    assert(CatalogChecks.totalOrderCheck(
      Seq((1, "a"), (2, "b"), (2, "c")).toDF("k", "v")
        .orderBy(col("v")).limit(2).orderBy(col("k"))).isLeft)
    // ungrouped aggregate: one row, order-safe with no data check
    val agg = CatalogChecks.totalOrderCheck(
      dup.agg(count(lit(1)).as("n")))
    assert(agg == Right(CatalogChecks.SortCheck(Nil, None)))
    // decimal detection, including nested
    val dec = Seq((1, BigDecimal(1.5))).toDF("k", "d")
    assert(CatalogChecks.decimalColumns(dec) == Seq("d"))
    assert(CatalogChecks.decimalColumns(
      dec.select(struct(col("d")).as("s"))) == Seq("s"))
    assert(CatalogChecks.decimalColumns(
      dec.select(col("d").cast("double").as("d"))).isEmpty)
    // missing ORDER BY is reported, not silently passed
    assert(CatalogChecks.totalOrderCheck(dec).isLeft)
  }

  Catalog.specs.foreach { spec =>
    test(s"boundary: ${spec.name} — no DECIMAL output, total ORDER BY") {
      val df = spec.run(spark, dir)
      val decs = CatalogChecks.decimalColumns(df)
      assert(decs.isEmpty,
        s"${spec.name} returns DECIMAL column(s) ${decs.mkString(",")}: " +
          "cast to double at the boundary (catalog convention)")
      CatalogChecks.totalOrderCheck(df) match {
        case Right(CatalogChecks.SortCheck(keys, Some(frame))) =>
          val ties = CatalogChecks.totalOrderViolations(frame, keys)
          assert(ties == 0L,
            s"${spec.name} ORDER BY (${keys.mkString(",")}) is not a " +
              s"total order: $ties tie group(s) hold differing rows — " +
              "both engines may emit them in either order")
        case Right(_) => // single-row shape: order-safe by construction
        case Left(reason) =>
          assert(sortShapeExceptions.contains(spec.name),
            s"${spec.name}: $reason — add a total-order ORDER BY or a " +
              "justified exception in CatalogSpec")
      }
    }
  }
}
