package graft.serve

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** The serving-layer query DSL (SURVEY §2.8).
  *
  * Reference request shape (viewer → `berdl_table_scanner`,
  * data/html/assets/main-BeiTHiEY.js): `{table_name, limit, offset,
  * sort_column, sort_order, col_filter, filters, aggregations, group_by,
  * search_value}`; advanced filter operators from
  * data/html/assets/AdvancedFilterPanel-CVIXRDdS.js; quick-filter text
  * sugar from data/html/assets/filter-parser-HXU3E1Qm.js.
  *
  * Compiles the whole request to a single declarative DataFrame plan —
  * filters land in the parquet scan via Catalyst pushdown, group-by is
  * one shuffle, pagination is `orderBy.offset.limit`. No custom
  * expressions needed (SURVEY §4.2).
  */
final case class ColumnFilter(
    column: String,
    op: String,                       // eq ne gt gte lt lte like ilike in not_in between is_null is_not_null regex
    value: Option[String] = None,
    values: Seq[String] = Nil,        // for in / not_in
    high: Option[String] = None)      // for between

final case class Aggregation(function: String, column: String, as: String)

final case class ScanRequest(
    table: String,
    limit: Option[Int] = None,
    offset: Option[Int] = None,
    sortColumn: Option[String] = None,
    sortOrder: String = "ASC",
    colFilter: Map[String, String] = Map.empty, // quick-filter text per column
    filters: Seq[ColumnFilter] = Nil,
    groupBy: Seq[String] = Nil,
    aggregations: Seq[Aggregation] = Nil,
    searchValue: Option[String] = None,
    // group_by with sub/grand total rows (ROLLUP); the appended
    // `grouping_level` column disambiguates total rows from real NULL
    // groups — 0 = leaf group, > 0 = rolled-up margin.
    withTotals: Boolean = false,
    // Keyset (cursor) pagination — the deep-scroll-safe alternative to
    // offset: `cursorColumns` are ascending key columns that totally
    // order the result (include a unique tie-break), `cursor` the last
    // served row's values for them (string-typed like filter values;
    // empty cursor = first page). Compiled via the strict-lexicographic
    // predicate expansion (Relational.keysetPage) so every conjunct is
    // pushdown-eligible — page N+1 costs O(limit), not O(N·limit).
    // Mutually exclusive with `offset`/`sortColumn`; requires `limit`.
    cursorColumns: Seq[String] = Nil,
    cursor: Seq[String] = Nil)

object TableScanner {

  /** Compile and run a scan request against a registered table. */
  def scan(df: DataFrame, req: ScanRequest): DataFrame = {
    var out = filtered(df, req)
    if (req.groupBy.nonEmpty || req.aggregations.nonEmpty) {
      // group_by with no aggregations is a valid viewer request: it
      // means "the distinct groups with their sizes", not an error.
      val aggs =
        if (req.aggregations.nonEmpty) req.aggregations.map(a => compileAgg(df.schema, a))
        else Seq(count(lit(1)).as("count"))
      out =
        if (req.groupBy.nonEmpty && req.withTotals) {
          // ROLLUP: one pass yields the leaf groups plus every margin
          // up to the grand total — the viewer's "totals row" without a
          // second aggregation query per level
          val withLevel = aggs :+ grouping_id().cast("long").as("grouping_level")
          out.rollup(req.groupBy.map(col): _*)
            .agg(withLevel.head, withLevel.tail: _*)
        } else if (req.groupBy.nonEmpty)
          out.groupBy(req.groupBy.map(col): _*).agg(aggs.head, aggs.tail: _*)
        else out.agg(aggs.head, aggs.tail: _*)
    }
    if (req.cursorColumns.nonEmpty) {
      // keyset page: filter-first (pushdown-eligible), TakeOrdered
      // keeps `limit` rows per partition — never order-and-discard
      require(req.offset.isEmpty && req.sortColumn.isEmpty,
        "cursor paging replaces offset/sort_column")
      require(req.cursor.isEmpty || req.cursor.size == req.cursorColumns.size,
        s"cursor arity ${req.cursor.size} != cursor_columns ${req.cursorColumns.size}")
      val lim = req.limit.getOrElse(
        throw new IllegalArgumentException("cursor paging requires limit"))
      // keyset traversal covers the NON-NULL key space: a NULL cursor
      // key has no position under strict `>` (every conjunct would be
      // NULL → page 2 silently empty, the rest of the table unserved),
      // so null-keyed rows are excluded from every page — fetch them
      // with an explicit is-null filter. The filter also guarantees a
      // client can never read a null key off the last row and echo
      // "null" back as the next cursor.
      req.cursorColumns.foreach(c => out = out.filter(col(c).isNotNull))
      if (req.cursor.isEmpty)
        out = out.orderBy(req.cursorColumns.map(col): _*).limit(lim)
      else {
        // Only NULL is positionless; the empty string is a legitimate
        // key value a STRING column's first page can legally end on,
        // and an echoed cursor must always be re-submittable. For any
        // other type an empty or unparseable value would cast to a
        // NULL literal, turn every strict conjunct NULL, and silently
        // truncate the walk — refuse those loudly instead.
        require(req.cursor.forall(_ != null),
          "cursor values must be non-null (a null key has no keyset position)")
        val schema = out.schema
        val keys = req.cursorColumns.zip(req.cursor).map { case (c, v) =>
          schema(c).dataType match {
            case _: StringType => ()
            case _: ByteType | _: ShortType | _: IntegerType | _: LongType =>
              // plain digits only: BigDecimal would also accept "1e5"
              // or "1.5", which Spark's string→integral cast NULLs out
              require(v.matches("""[+-]?\d+"""),
                s"cursor value '$v' for integral column $c is unparseable " +
                  "(it would compile to NULL and truncate the walk)")
            case _: FloatType | _: DoubleType =>
              // a page can legally end on NaN/Infinity (Spark orders
              // NaN above every other double), and Spark's string→
              // double cast parses those special literals — so no
              // driver-side parse here; the in-plan null-cast backstop
              // below still refuses genuinely unparseable values, and
              // every echoed cursor stays re-submittable.
              ()
            case _: NumericType =>
              require(scala.util.Try(BigDecimal(v)).isSuccess,
                s"cursor value '$v' for numeric column $c is unparseable " +
                  "(it would compile to NULL and truncate the walk)")
            case _ =>
              require(v.nonEmpty,
                s"empty cursor value for non-string column $c has no keyset position")
          }
          // runtime backstop for what driver-side parsing can't see
          // (integral range overflow, garbage dates/timestamps): a
          // cast that lands NULL raises instead of silently turning
          // every strict conjunct NULL and truncating the walk. The
          // when() over the foldable cast constant-folds to a plain
          // literal on the valid path, so pushdown is unaffected.
          val l = typed(v, schema(c).dataType)
          val guarded = schema(c).dataType match {
            case _: StringType => l
            case dt => when(l.isNull, raise_error(lit(
              s"cursor value '$v' does not parse as ${dt.sql} for column $c")))
              .otherwise(l)
          }
          (col(c), guarded)
        }
        out = graft.operators.Relational.keysetPage(out, keys, lim)
      }
      return out
    }
    req.sortColumn.foreach { c =>
      val o = if (req.sortOrder.equalsIgnoreCase("DESC")) col(c).desc else col(c).asc
      out = out.orderBy(o)
    }
    req.offset.filter(_ > 0).foreach(n => out = out.offset(n))
    req.limit.foreach(n => out = out.limit(n))
    out
  }

  /** `total_count` endpoint: row count after filters, before paging. */
  def totalCount(df: DataFrame, req: ScanRequest): DataFrame =
    filtered(df, req).agg(count(lit(1)).as("total_count"))

  /** `getTableSchema` endpoint (reference viewer bootstraps each table
    * from a schema call): one row per column with the SQL type name and
    * the numeric/text affinity the quick-filter parser keys off. */
  def tableSchema(df: DataFrame): Seq[(String, String, String)] =
    df.schema.fields.toSeq.map { f =>
      val affinity = f.dataType match {
        case _: NumericType => "numeric"
        case _: TimestampType | _: TimestampNTZType | _: DateType => "temporal"
        case _ => "text"
      }
      (f.name, f.dataType.sql, affinity)
    }

  private def filtered(df: DataFrame, req: ScanRequest): DataFrame = {
    val quick = req.colFilter.toSeq.sortBy(_._1).map { case (c, text) =>
      compileFilter(df.schema, FilterParser.parse(df.schema, c, text))
    }
    val adv = req.filters.map(f => compileFilter(df.schema, f))
    val search = req.searchValue.filter(_.nonEmpty).map(globalSearch(df, _))
    (quick ++ adv ++ search).foldLeft(df)((d, p) => d.filter(p))
  }

  /** One advanced-panel filter → Column predicate. Values are typed by
    * casting the literal to the column's type (the reference relies on
    * SQLite type affinity; here the parquet schema is authoritative). */
  def compileFilter(schema: StructType, f: ColumnFilter): Column = {
    val c = col(f.column)
    val dt = schema(f.column).dataType
    def v  = typed(f.value.get, dt)
    def vs = f.values.map(typed(_, dt))
    f.op match {
      case "eq"          => c === v
      case "ne"          => c =!= v
      case "gt"          => c > v
      case "gte"         => c >= v
      case "lt"          => c < v
      case "lte"         => c <= v
      case "like"        => c.like(f.value.get)
      case "ilike"       => c.ilike(f.value.get)
      case "in"          => c.isin(vs: _*)
      case "not_in"      => !c.isin(vs: _*)
      case "between"     => c >= v && c <= typed(f.high.get, dt)
      case "is_null"     => c.isNull
      case "is_not_null" => c.isNotNull
      case "regex"       => c.rlike(f.value.get)
      case other         => throw new IllegalArgumentException(s"unknown filter op: $other")
    }
  }

  private def typed(raw: String, dt: DataType): Column = dt match {
    case _: NumericType | _: TimestampType | _: DateType => lit(raw).cast(dt)
    case _ => lit(raw)
  }

  /** Global search: case-insensitive contains across every column,
    * OR-chained (viewer `search_value`). */
  def globalSearch(df: DataFrame, needle: String): Column =
    df.schema.fields.map { f =>
      lower(col(f.name).cast("string")).contains(lit(needle.toLowerCase))
    }.reduce(_ || _)

  /** `FUNCTION(column)` aggregations of the viewer API
    * (count/sum/avg/min/max/distinct_count — the aggregation panel's
    * option list, main-BeiTHiEY.js). */
  def compileAgg(schema: StructType, a: Aggregation): Column = {
    val c = col(a.column)
    val e = a.function.toLowerCase match {
      case "count"          => count(c)
      case "sum"            => sum(c)
      case "avg"            => avg(c)
      case "min"            => min(c)
      case "max"            => max(c)
      case "distinct_count" => countDistinct(c)
      case other => throw new IllegalArgumentException(s"unknown aggregation: $other")
    }
    e.as(a.as)
  }

  /** The stats-viewer endpoint (reference viewer `statsViewer`,
    * main-BeiTHiEY.js: row_count / null_count / distinct_count / min /
    * max / avg per column): ONE aggregate pass over the filtered
    * table. min/max are rendered as strings so the row shape is
    * column-type-agnostic like the viewer's; avg is null for
    * non-numeric columns. */
  def columnStats(df: DataFrame, column: String): DataFrame = {
    val c = col(column)
    val isNumeric = df.schema(column).dataType.isInstanceOf[NumericType]
    val avgCol =
      if (isNumeric) avg(c) else lit(null).cast("double")
    df.agg(
      count(lit(1)).as("row_count"),
      sum(when(c.isNull, 1).otherwise(0)).cast("long").as("null_count"),
      countDistinct(c).as("distinct_count"),
      min(c).cast("string").as("min"),
      max(c).cast("string").as("max"),
      avgCol.as("avg"))
  }

  /** Percentile panel of the stats viewer: one (p, value) row per
    * requested fraction, exact (sorted-interpolated, the
    * `quantile_cont` definition — what a viewer shows for a filtered
    * table). Exact percentile aggregates a per-value count map; for the
    * 100 TB path use [[approxColumnPercentiles]] (t-digest sketch,
    * mergeable, bounded memory) — same output shape. */
  def columnPercentiles(df: DataFrame, column: String, ps: Seq[Double]): DataFrame = {
    require(ps.nonEmpty && ps.forall(p => p >= 0 && p <= 1), "fractions in [0,1]")
    val pArr = array(ps.map(lit): _*)
    df.agg(expr(s"percentile($column, array(${ps.mkString(", ")}))").as("vals"))
      .select(posexplode(col("vals")).as(Seq("i", "v")))
      .select(element_at(pArr, col("i").cast("int") + 1).as("p"),
        (floor(col("v") * 10000 + lit(0.5)) / 10000).as("value"))
  }

  /** Sketch-based percentiles (`approx_percentile`): the scale default
    * — bounded-memory, mergeable across partitions, no value map. Not
    * differential-oracle-gated (sketches are engine-specific);
    * TableScannerSpec bounds its error against the exact path. */
  def approxColumnPercentiles(df: DataFrame, column: String, ps: Seq[Double],
                              accuracy: Int = 10000): DataFrame = {
    val pArr = array(ps.map(lit): _*)
    df.agg(expr(
      s"approx_percentile($column, array(${ps.mkString(", ")}), $accuracy)").as("vals"))
      .select(posexplode(col("vals")).as(Seq("i", "v")))
      .select(element_at(pArr, col("i").cast("int") + 1).as("p"),
        col("v").cast("double").as("value"))
  }

  /** HyperLogLog++ distinct count (`approx_count_distinct`): the scale
    * default for `distinct_count` — one pass, fixed-size sketch,
    * mergeable, vs the exact countDistinct's full shuffle of the value
    * space. Not oracle-gated (HLL layouts are engine-specific);
    * TableScannerSpec bounds its relative error against the exact
    * count. */
  def approxDistinctCount(df: DataFrame, column: String, rsd: Double = 0.05): DataFrame =
    df.agg(approx_count_distinct(col(column), rsd).as("approx_distinct"))
}

/** Quick-filter text sugar (reference: filter-parser-HXU3E1Qm.js):
  * `null` / `not null` / `!null`; comparator prefixes `<= >= != < > =`
  * on numeric columns; `a,b,c` → in; `!a,b` → not_in;
  * `between X and Y` / `X..Y` / `X-Y` → between (the dash form only on
  * strictly NUMERIC columns — a hyphen in free text stays an ilike
  * substring, and a partial date on a temporal column must not split);
  * bare text → ilike contains.
  */
object FilterParser {
  private val Between = "(?i)^between\\s+(\\S+)\\s+and\\s+(\\S+)$".r
  private val Range   = "^(-?[\\d.]+)\\.\\.(-?[\\d.]+)$".r
  // dash range: each bound is a number whose OWN leading minus binds to
  // it, so `-5-5` parses as between(-5, 5) — the separator dash is the
  // first dash that isn't a bound's sign (the reference's \S+ greedy
  // backtrack lands on the same split). Date literals (`2024-01-02`)
  // cannot match: the second bound would have to contain a dash.
  private val DashRange = "^(-?[\\d.]+)\\s*-\\s*(-?[\\d.]+)$".r
  private val Cmp     = "^(<=|>=|!=|<|>|=)\\s*(.+)$".r

  def parse(schema: StructType, column: String, text: String): ColumnFilter = {
    val t = text.trim
    // comparator sugar applies to anything ordered-comparable after a
    // cast — numbers AND temporal columns (SQLite NUMERIC affinity
    // covers dates in the reference)
    val numeric = schema(column).dataType match {
      case _: NumericType | _: TimestampType | _: TimestampNTZType | _: DateType => true
      case _ => false
    }
    // The bare dash-range sugar is NUMERIC-ONLY: on a temporal column
    // a partial-date literal like `2024-01` would otherwise parse as
    // between('2024', '01') and fail the ANSI string→date cast loudly
    // (full `yyyy-MM-dd` literals can't match — their second "bound"
    // would itself contain a dash — but prefixes can). Temporal
    // ranges keep the explicit `between X and Y` / `X..Y` forms.
    val strictlyNumeric = schema(column).dataType match {
      case _: NumericType => true
      case _ => false
    }
    t.toLowerCase match {
      case "null"             => return ColumnFilter(column, "is_null")
      case "not null" | "!null" => return ColumnFilter(column, "is_not_null")
      case _                  =>
    }
    t match {
      case Between(lo, hi) => ColumnFilter(column, "between", Some(lo), Nil, Some(hi))
      case Range(lo, hi)   => ColumnFilter(column, "between", Some(lo), Nil, Some(hi))
      case DashRange(lo, hi) if strictlyNumeric =>
        ColumnFilter(column, "between", Some(lo), Nil, Some(hi))
      case Cmp(op, v) if numeric =>
        val name = op match {
          case "<=" => "lte"; case ">=" => "gte"; case "!=" => "ne"
          case "<"  => "lt";  case ">"  => "gt";  case "="  => "eq"
        }
        ColumnFilter(column, name, Some(v.trim))
      case s if s.startsWith("!") && s.contains(",") =>
        ColumnFilter(column, "not_in", None, s.drop(1).split(",").map(_.trim).toSeq)
      case s if s.startsWith("!") =>
        ColumnFilter(column, "ne", Some(s.drop(1).trim))
      case s if s.contains(",") =>
        ColumnFilter(column, "in", None, s.split(",").map(_.trim).toSeq)
      case s if numeric =>
        ColumnFilter(column, "eq", Some(s))
      case s =>
        ColumnFilter(column, "ilike", Some(s"%$s%"))
    }
  }
}
