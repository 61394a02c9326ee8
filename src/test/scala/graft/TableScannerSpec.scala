package graft

import graft.serve._

class TableScannerSpec extends SparkTestBase {
  import spark.implicits._

  /** Either our in-plan backstop ("does not parse" — non-ANSI
    * sessions, where the cast would NULL out) or Spark's own ANSI
    * cast error — both are the loud refusal the cursor contract
    * promises. Walks the full cause chain. */
  private def loudCastFailure(e: Throwable): Boolean =
    Iterator.iterate(e)(_.getCause).takeWhile(_ != null).take(8).exists { t =>
      val m = Option(t.getMessage).getOrElse("")
      m.contains("does not parse") || m.contains("CAST_INVALID_INPUT")
    }

  lazy val df = Seq(
    (1L, "alpha", 10.0), (2L, "beta", 20.0), (3L, "gamma", 30.0), (4L, null, 40.0))
    .toDF("id", "name", "score")

  test("advanced filter operators") {
    def run(f: ColumnFilter): Set[Long] =
      TableScanner.scan(df, ScanRequest("t", filters = Seq(f)))
        .select("id").as[Long].collect().toSet
    assert(run(ColumnFilter("score", "gte", Some("20"))) === Set(2L, 3L, 4L))
    assert(run(ColumnFilter("name", "ilike", Some("%ALpH%"))) === Set(1L))
    assert(run(ColumnFilter("id", "in", None, Seq("1", "3"))) === Set(1L, 3L))
    assert(run(ColumnFilter("id", "not_in", None, Seq("1", "3"))) === Set(2L, 4L))
    assert(run(ColumnFilter("score", "between", Some("15"), Nil, Some("35"))) === Set(2L, 3L))
    assert(run(ColumnFilter("name", "is_null")) === Set(4L))
    assert(run(ColumnFilter("name", "is_not_null")) === Set(1L, 2L, 3L))
    assert(run(ColumnFilter("name", "regex", Some("^(al|ga)"))) === Set(1L, 3L))
  }

  test("quick-filter parser sugar (reference filter-parser semantics)") {
    val schema = df.schema
    assert(FilterParser.parse(schema, "name", "null").op === "is_null")
    assert(FilterParser.parse(schema, "name", "!null").op === "is_not_null")
    assert(FilterParser.parse(schema, "score", ">= 20") ===
      ColumnFilter("score", "gte", Some("20")))
    assert(FilterParser.parse(schema, "score", "10..30").op === "between")
    assert(FilterParser.parse(schema, "score", "between 10 and 30").op === "between")
    assert(FilterParser.parse(schema, "name", "a,b").op === "in")
    assert(FilterParser.parse(schema, "name", "!a,b").op === "not_in")
    assert(FilterParser.parse(schema, "score", "20") === ColumnFilter("score", "eq", Some("20")))
    assert(FilterParser.parse(schema, "name", "alp") ===
      ColumnFilter("name", "ilike", Some("%alp%")))
  }

  test("quick-filter X-Y dash range (numeric only, signs bind to bounds)") {
    val schema = df.schema
    assert(FilterParser.parse(schema, "score", "10-50") ===
      ColumnFilter("score", "between", Some("10"), Nil, Some("50")))
    // each bound's own leading minus binds to it: -5-5 = between(-5, 5)
    assert(FilterParser.parse(schema, "score", "-5-5") ===
      ColumnFilter("score", "between", Some("-5"), Nil, Some("5")))
    assert(FilterParser.parse(schema, "score", "2.5 - 7.5") ===
      ColumnFilter("score", "between", Some("2.5"), Nil, Some("7.5")))
    // a hyphen in free text stays an ilike substring, not a range
    assert(FilterParser.parse(schema, "name", "foo-bar") ===
      ColumnFilter("name", "ilike", Some("%foo-bar%")))
    // a lone negative number is an eq, not a half-open range
    assert(FilterParser.parse(schema, "score", "-5") ===
      ColumnFilter("score", "eq", Some("-5")))
    // the range filters rows end-to-end
    val ids = TableScanner.scan(df, ScanRequest("t",
      colFilter = Map("score" -> "15-35")))
      .select("id").as[Long].collect().toSet
    assert(ids === Set(2L, 3L))
    // TEMPORAL columns are excluded from the bare dash form: a
    // partial-date quick filter like '2024-01' must NOT parse as
    // between('2024', '01') — it falls through to the pre-existing
    // comparable-column eq (a full 'yyyy-MM-dd' literal casts fine;
    // a partial one fails THAT cast loudly, same as before the dash
    // sugar existed). Explicit range forms remain for dates.
    val dSchema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("day",
        org.apache.spark.sql.types.DateType)))
    assert(FilterParser.parse(dSchema, "day", "2024-01") ===
      ColumnFilter("day", "eq", Some("2024-01")))
    assert(FilterParser.parse(dSchema, "day",
      "between 2024-01-01 and 2024-02-01").op === "between")
  }

  test("pagination + sort + total_count") {
    val page = TableScanner.scan(df, ScanRequest("t",
      sortColumn = Some("score"), sortOrder = "DESC", limit = Some(2), offset = Some(1)))
      .select("id").as[Long].collect().toSeq
    assert(page === Seq(3L, 2L))
    val n = TableScanner.totalCount(df, ScanRequest("t",
      filters = Seq(ColumnFilter("score", "gt", Some("15")))))
      .as[Long].head()
    assert(n === 3L)
  }

  test("group_by + aggregations") {
    val got = TableScanner.scan(df, ScanRequest("t",
      groupBy = Seq(), aggregations = Seq(
        Aggregation("count", "id", "n"), Aggregation("max", "score", "mx"))))
    val row = got.collect().head
    assert(row.getLong(0) === 4L && row.getDouble(1) === 40.0)
  }

  test("group_by with no aggregations returns group sizes, not an error") {
    val got = TableScanner.scan(df, ScanRequest("t", groupBy = Seq("name")))
    assert(got.columns.toSeq == Seq("name", "count"))
    val m = got.as[(String, Long)].collect().toMap
    assert(m.size == 4 && m.values.sum == 4L) // incl. the null group
  }

  test("with_totals: leaf groups plus the grand-total margin in one pass") {
    val got = TableScanner.scan(df, ScanRequest("t",
      groupBy = Seq("name"), withTotals = true))
      .select("name", "count", "grouping_level")
      .as[(Option[String], Long, Long)].collect()
    val leaves = got.filter(_._3 == 0L)
    val totals = got.filter(_._3 == 1L)
    assert(leaves.length == 4 && leaves.map(_._2).sum == 4L)
    assert(totals.toSeq == Seq((None, 4L, 1L)),
      "exactly one grand-total row, count = all rows")
    // grouping_level separates the REAL null group from the total row
    assert(leaves.exists(l => l._1.isEmpty && l._2 == 1L))
  }

  test("distinct_count aggregation and the stats-viewer endpoint") {
    val got = TableScanner.scan(df, ScanRequest("t",
      aggregations = Seq(Aggregation("distinct_count", "name", "n_names"))))
    assert(got.collect().head.getLong(0) === 3L) // null not counted
    val stats = TableScanner.columnStats(df, "score").collect().head
    assert(stats.getAs[Long]("row_count") === 4L)
    assert(stats.getAs[Long]("null_count") === 0L)
    assert(stats.getAs[Long]("distinct_count") === 4L)
    assert(stats.getAs[String]("min") === "10.0" && stats.getAs[String]("max") === "40.0")
    assert(stats.getAs[Double]("avg") === 25.0)
    val nameStats = TableScanner.columnStats(df, "name").collect().head
    assert(nameStats.getAs[Long]("null_count") === 1L)
    assert(nameStats.getAs[Any]("avg") == null) // non-numeric
  }

  test("global search hits any column, case-insensitive") {
    val got = TableScanner.scan(df, ScanRequest("t", searchValue = Some("AMM")))
      .select("id").as[Long].collect().toSet
    assert(got === Set(3L))
  }

  test("tableSchema reports name, SQL type, and filter affinity") {
    val sch = TableScanner.tableSchema(
      graft.core.Lakehouse.table(spark, sfSmoke, "orders"))
    val byName = sch.map(t => t._1 -> ((t._2, t._3))).toMap
    assert(byName("o_orderkey")._2 == "numeric")
    assert(byName("o_orderstatus")._2 == "text")
    assert(byName("o_orderdate")._2 == "temporal")
    assert(byName("o_totalprice") == (("DOUBLE", "numeric")))
  }

  test("percentiles: exact matches quantile_cont; approx within sketch error") {
    val orders = graft.core.Lakehouse.table(spark, sfSmoke, "orders")
    val ps = Seq(0.25, 0.5, 0.75)
    val exact = TableScanner.columnPercentiles(orders, "o_totalprice", ps)
      .as[(Double, Double)].collect().toMap
    // hand-check the median against a direct sort
    val vals = orders.select("o_totalprice").as[Double].collect().sorted
    val idx = 0.5 * (vals.length - 1)
    val want = vals(idx.toInt) +
      (idx - idx.toInt) * (vals(math.ceil(idx).toInt) - vals(idx.toInt))
    assert(math.abs(exact(0.5) - want) < 1e-3)
    assert(exact(0.25) <= exact(0.5) && exact(0.5) <= exact(0.75))
    // the sketch path lands within 2% of exact on every fraction
    val approx = TableScanner.approxColumnPercentiles(orders, "o_totalprice", ps)
      .as[(Double, Double)].collect().toMap
    ps.foreach { p =>
      assert(math.abs(approx(p) - exact(p)) / exact(p) < 0.02,
        s"p=$p approx=${approx(p)} exact=${exact(p)}")
    }
  }

  test("approxDistinctCount is within HLL error of the exact count") {
    val li = graft.core.Lakehouse.table(spark, sfSmoke, "lineitem")
    val exact = li.select("l_partkey").distinct().count()
    val approx = TableScanner.approxDistinctCount(li, "l_partkey", rsd = 0.05)
      .as[Long].head()
    assert(math.abs(approx - exact).toDouble / exact < 0.15,
      s"approx=$approx exact=$exact")
  }

  test("comparator quick-filters work on temporal columns") {
    val ev = graft.core.Lakehouse.table(spark, sfSmoke, "orders")
    val parsed = FilterParser.parse(ev.schema, "o_orderdate", ">= 1995-01-01")
    assert(parsed.op == "gte")
    val n = ev.filter(TableScanner.compileFilter(ev.schema, parsed)).count()
    val want = ev.filter(org.apache.spark.sql.functions.col("o_orderdate") >=
      "1995-01-01").count()
    assert(n == want && n > 0)
  }

  test("SqlEndpoint pages a raw SQL query with an exact has_more flag") {
    import graft.serve.SqlEndpoint
    SqlEndpoint.register(spark, sfSmoke)
    val sql = "SELECT n_nationkey, n_name FROM nation ORDER BY n_nationkey"
    val full = spark.sql(sql).collect().map(_.get(0).toString).toSeq
    assert(full.size == 25)
    // walk the endpoint the way the reference client loop does
    var offset = 0
    val limit = 10
    var pages = List.empty[SqlEndpoint.Page]
    var more = true
    while (more) {
      val p = SqlEndpoint.page(spark, sql, limit, offset)
      pages ::= p; more = p.hasMore; offset += limit
    }
    val walked = pages.reverse.flatMap(_.rows.map(_.get(0).toString))
    assert(walked == full, "concatenated pages must equal the full result")
    assert(pages.reverse.map(_.hasMore) == List(true, true, false))
    assert(pages.head.rows.size == 5, "last page carries the remainder only")
  }

  test("cursor paging: walked pages equal offset paging; predicate is pushed") {
    import org.apache.spark.sql.functions.col
    val orders = graft.core.Lakehouse.table(spark, sfSmoke, "orders")
    val keys = Seq("o_orderdate", "o_orderkey")
    val full = orders.orderBy(keys.map(col): _*)
      .select("o_orderkey").collect().map(_.getLong(0)).toSeq
    // walk by cursor exactly as a deep-scrolling client would
    var cursor = Seq.empty[String]
    var walked = Vector.empty[Long]
    var page = 0
    while (page == 0 || cursor.nonEmpty) {
      val got = TableScanner.scan(orders, ScanRequest("orders",
        limit = Some(40), cursorColumns = keys, cursor = cursor)).collect()
      walked ++= got.map(_.getAs[Long]("o_orderkey"))
      cursor =
        if (got.length < 40) Seq.empty
        else keys.map(k => got.last.getAs[Any](k).toString)
      page += 1
    }
    assert(walked.take(full.size) == full && page > 2,
      s"cursor walk diverged after ${walked.size} rows / $page pages")
    // plan shape at depth: the cursor conjuncts reach the parquet scan
    // and the page is a TakeOrdered (per-partition heaps), never a
    // global-sort-then-discard
    val deep = TableScanner.scan(orders, ScanRequest("orders",
      limit = Some(40), cursorColumns = keys,
      cursor = Seq("1997-06-01 00:00:00", "400")))
    val plan = deep.queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"), s"no TakeOrdered:\n$plan")
    assert(plan.contains(
      "PushedFilters: [IsNotNull(o_orderdate), IsNotNull(o_orderkey), Or(GreaterThan(o_orderdate"),
      s"cursor predicate (incl. the non-null key guards) not pushed to scan:\n$plan")
    // first page (empty cursor) is served, ordered, limit-bounded
    val first = TableScanner.scan(orders, ScanRequest("orders",
      limit = Some(40), cursorColumns = keys)).collect()
    assert(first.map(_.getAs[Long]("o_orderkey")).toSeq == full.take(40))
    // contract violations fail loudly
    intercept[IllegalArgumentException] {
      TableScanner.scan(orders, ScanRequest("orders",
        cursorColumns = keys, cursor = Seq("x"), limit = Some(10)))
    }
    intercept[IllegalArgumentException] {
      TableScanner.scan(orders, ScanRequest("orders", cursorColumns = keys))
    }
    intercept[IllegalArgumentException] {
      TableScanner.scan(orders, ScanRequest("orders", cursorColumns = keys,
        limit = Some(10), offset = Some(5)))
    }
  }

  test("cursor paging on a nullable key serves every non-null row, loses none") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    // nulls sort FIRST ascending: without the non-null guard, page 1
    // returns null-key rows whose echoed cursor ("null") would turn
    // every strict conjunct NULL and silently truncate the walk
    val df = (1L to 200L)
      .map(i => (i, if (i % 7 == 0) None else Some(i * 3 % 101)))
      .toDF("id", "k")
    val keys = Seq("k", "id")
    val nonNull = df.filter(col("k").isNotNull).orderBy(keys.map(col): _*)
      .select("id").as[Long].collect().toSeq
    var cursor = Seq.empty[String]
    var walked = Vector.empty[Long]
    var page = 0
    while (page == 0 || cursor.nonEmpty) {
      val got = TableScanner.scan(df, ScanRequest("t",
        limit = Some(30), cursorColumns = keys, cursor = cursor)).collect()
      walked ++= got.map(_.getAs[Long]("id"))
      cursor =
        if (got.length < 30) Seq.empty
        else keys.map(k => got.last.getAs[Any](k).toString)
      page += 1
    }
    assert(walked == nonNull,
      s"keyset walk over the non-null key space diverged (page $page)")
    // an empty / unparseable NUMERIC cursor value refuses instead of
    // compiling to NULL and silently truncating the walk
    intercept[IllegalArgumentException] {
      TableScanner.scan(df, ScanRequest("t", limit = Some(30),
        cursorColumns = keys, cursor = Seq("", "5")))
    }
    intercept[IllegalArgumentException] {
      TableScanner.scan(df, ScanRequest("t", limit = Some(30),
        cursorColumns = keys, cursor = Seq("abc", "5")))
    }
    // exponent notation parses as BigDecimal but NULLs under Spark's
    // string→integral cast — it must refuse eagerly too
    intercept[IllegalArgumentException] {
      TableScanner.scan(df, ScanRequest("t", limit = Some(30),
        cursorColumns = keys, cursor = Seq("1e5", "5")))
    }
    // integral range overflow passes the digits regex; the in-plan
    // backstop raises instead of truncating the walk
    val big = intercept[Exception] {
      TableScanner.scan(df, ScanRequest("t", limit = Some(30),
        cursorColumns = keys,
        cursor = Seq("99999999999999999999999", "5"))).collect()
    }
    assert(loudCastFailure(big), s"expected a loud cast failure, got: $big")
  }

  test("cursor paging: a garbage temporal cursor raises, never truncates") {
    val orders = graft.core.Lakehouse.table(spark, sfSmoke, "orders")
    val keys = Seq("o_orderdate", "o_orderkey")
    val ex = intercept[Exception] {
      TableScanner.scan(orders, ScanRequest("orders", limit = Some(10),
        cursorColumns = keys, cursor = Seq("not-a-date", "400"))).collect()
    }
    assert(loudCastFailure(ex), s"expected a loud cast failure, got: $ex")
  }

  test("cursor paging: an echoed empty-string key is re-submittable") {
    import spark.implicits._
    // the empty string sorts FIRST among strings, so page 1 of this
    // table legally ends on it; a client echoing ("", "2") back must
    // get the rest of the table, not an IllegalArgumentException
    val df = Seq(("", 1L), ("", 2L), ("a", 3L), ("b", 4L), ("c", 5L))
      .toDF("k", "id")
    val keys = Seq("k", "id")
    val p1 = TableScanner.scan(df, ScanRequest("t", limit = Some(2),
      cursorColumns = keys)).collect()
    assert(p1.map(_.getAs[Long]("id")).toSeq == Seq(1L, 2L))
    assert(p1.last.getAs[String]("k") == "")
    val echoed = keys.map(k => p1.last.getAs[Any](k).toString)
    val p2 = TableScanner.scan(df, ScanRequest("t", limit = Some(10),
      cursorColumns = keys, cursor = echoed)).collect()
    assert(p2.map(_.getAs[Long]("id")).toSeq == Seq(3L, 4L, 5L),
      "walk stalled on an echoed empty-string cursor")
  }

  test("cursor paging: echoed NaN/Infinity double keys are re-submittable") {
    import spark.implicits._
    // Spark orders NaN above every other double and Infinity just
    // below it, so a page can legally end on either; the echoed
    // special literal must re-submit (Spark's string→double cast
    // parses it) instead of failing a driver-side BigDecimal parse
    val df = Seq((1.0, 1L), (2.0, 2L), (Double.PositiveInfinity, 3L),
      (Double.NaN, 4L), (Double.NaN, 5L)).toDF("v", "id")
    val keys = Seq("v", "id")
    var cursor = Seq.empty[String]
    var walked = Seq.empty[Long]
    var page = 0
    while (page == 0 || cursor.nonEmpty) {
      val rows = TableScanner.scan(df, ScanRequest("t", limit = Some(2),
        cursorColumns = keys, cursor = cursor)).collect()
      walked ++= rows.map(_.getAs[Long]("id"))
      cursor =
        if (rows.length < 2) Seq.empty
        else keys.map(k => rows.last.getAs[Any](k).toString)
      page += 1
    }
    assert(walked == Seq(1L, 2L, 3L, 4L, 5L),
      s"NaN/Infinity keyset walk diverged: $walked")
    // garbage still refuses loudly via the in-plan backstop
    val ex = intercept[Exception] {
      TableScanner.scan(df, ScanRequest("t", limit = Some(2),
        cursorColumns = keys, cursor = Seq("not-a-double", "1"))).collect()
    }
    assert(loudCastFailure(ex), s"expected a loud cast failure, got: $ex")
  }

  test("cursor paging composes with the response cache clamp") {
    val cache = new ResponseCache()
    val orders = graft.core.Lakehouse.table(spark, sfSmoke, "orders")
    val req = ScanRequest("orders", limit = Some(25),
      cursorColumns = Seq("o_orderdate", "o_orderkey"),
      cursor = Seq("1995-06-01 00:00:00", "400"))
    val p1 = CachedScanner.scanPage(cache, orders, req)
    val p2 = CachedScanner.scanPage(cache, orders, req)
    assert(p1.rows.size == 25 && p1.truncated, "mid-table page must have more")
    assert(p1.rows == p2.rows && cache.hits == 1 && cache.misses == 1)
  }
}
