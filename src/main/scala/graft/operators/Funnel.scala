package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Ordered-step funnel analysis over an event log — how many users
  * progressed view → click → purchase (strictly in time order), and how
  * long each step took from funnel entry.
  *
  * Semantics: step 0 is a user's earliest event of the first type; step
  * i+1 counts only events strictly AFTER that user's earliest completion
  * of step i (the classic "strict ordered funnel" — re-ordering a
  * purchase before its click does not count).
  *
  * Scale shape: one filtered partial-agg per step over the event scan,
  * then a per-user equi-join against the previous step's frame. Every
  * join and groupBy keys on the same user column, so the exchanges all
  * hash-partition identically and AQE/ReuseExchange keep the per-step
  * frames (|users| rows, not |events|) co-located; nothing driver-side,
  * no window over the full log. Timestamps stay exact epoch-micro longs
  * so sums are integer-exact and the mean is reproducible regardless of
  * partition order (no float-summation nondeterminism).
  */
object Funnel {

  /** One row per funnel step: step name, index, users reaching it, and
    * mean seconds from funnel entry (exact-integer sum / count / 1e6,
    * floor-rounded to 2 decimals like the rest of the suite). */
  def steps(events: DataFrame, userCol: String, typeCol: String,
            tsUsCol: String, stepTypes: Seq[String],
            windowUs: Option[Long] = None): DataFrame = {
    require(stepTypes.nonEmpty, "funnel needs at least one step")
    val u = col(userCol)

    // reached(i): (user, __t0 = entry micros, __t = step-i micros).
    // With a conversion window, step events count only inside
    // [entry, entry + windowUs) — the standard "converted within N
    // days" refinement; the bound rides the same join filter, so the
    // plan shape is unchanged.
    val reachedFrames = stepTypes.zipWithIndex.scanLeft(Option.empty[DataFrame]) {
      case (prev, (stepType, i)) =>
        val evs = events.filter(col(typeCol) === stepType)
        // each reached frame is consumed twice (next step's join + its
        // own count row) and transitively by every later step;
        // materializing it (|users| rows) keeps the event scan at one
        // pass per step instead of re-deriving the whole chain per
        // union branch (Catalyst does not CSE across branches)
        Some((prev match {
          case None =>
            evs.groupBy(u).agg(min(col(tsUsCol)).as("__t"))
              .withColumn("__t0", col("__t"))
          case Some(r) =>
            val inOrder = col(tsUsCol) > col("__t")
            val bounded = windowUs.fold(inOrder)(w =>
              inOrder && col(tsUsCol) < col("__t0") + lit(w))
            evs.join(r.select(u, col("__t"), col("__t0")), Seq(userCol))
              .filter(bounded)
              .groupBy(u, col("__t0"))
              .agg(min(col(tsUsCol)).as("__t"))
        }).localCheckpoint())
    }.flatten

    val perStep = reachedFrames.zip(stepTypes).zipWithIndex.map {
      case ((r, stepType), i) =>
        r.agg(
          count(lit(1)).as("n_users"),
          // exact long sum → one double division → deterministic mean
          graft.queries.round2(
            sum(col("__t") - col("__t0")).cast("double") /
              count(lit(1)) / lit(1000000)).as("avg_secs"))
          .select(lit(stepType).as("step"), lit(i).as("step_idx"),
            col("n_users"), col("avg_secs"))
    }
    perStep.reduce(_ union _)
  }
}
