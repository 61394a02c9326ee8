package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Event path analysis: the first-order transition matrix ("after a
  * view, what happens next?") behind sankey/flow dashboards and
  * simple Markov churn models.
  *
  * Scale shape: one window pass (`lead` over the per-key event order —
  * the same exchange/sort every sessionization query already pays),
  * then a (src, dst) count whose output is |event-type|² rows at most.
  * The per-source normalization joins the transition counts against
  * the per-source totals — both frames are vocabulary-sized, an
  * AQE-broadcast join at any corpus scale.
  */
object Paths {

  /** (src, dst, n, p) per observed transition; `p` normalizes over
    * each source's outgoing transitions. Terminal events (a key's last)
    * have no successor and drop out, the usual convention. */
  def transitions(df: DataFrame, partitionCols: Seq[Column],
                  orderCols: Seq[Column], stateCol: Column): DataFrame = {
    val w = Window.partitionBy(partitionCols: _*).orderBy(orderCols: _*)
    val steps = df.select(stateCol.as("src"),
        lead(stateCol, 1).over(w).as("dst"))
      .filter(col("dst").isNotNull)
    // counts feeds both the output and the totals branch; Catalyst
    // does not CSE across branches, so materialize once or the full
    // scan + window run twice (the Skew.report defect class). AQE
    // still broadcasts the totals side from its true runtime size.
    val counts = steps.groupBy(col("src"), col("dst"))
      .agg(count(lit(1)).as("n"))
      .localCheckpoint()
    val totals = counts.groupBy(col("src")).agg(sum(col("n")).as("__tot"))
    counts.join(totals, Seq("src"))
      .select(col("src"), col("dst"), col("n"),
        graft.queries.round4(col("n").cast("double") / col("__tot")).as("p"))
  }
}
