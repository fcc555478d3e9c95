package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.ExpressionInfo

import graft.functions.{DotProduct, SimHashBits, SortedIntersectCount, SpaceSavingTopK}

/** Session extensions wiring graft's engine pieces into any SparkSession:
  * the native SQL expressions, the GroupedTopK planning strategy, and the
  * row_number-top-k rewrite rule
  * ([[graft.plans.RowNumberTopKRewrite]]):
  *
  *   SparkSession.builder().withExtensions(new GraftExtensions).getOrCreate()
  *   // or: spark.sql.extensions=graft.GraftExtensions
  *   spark.sql("SELECT dot_product(embedding, embedding) FROM embeddings")
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(e: SparkSessionExtensions): Unit = {
    e.injectOptimizerRule(_ => graft.plans.RowNumberTopKRewrite)
    e.injectPlannerStrategy(_ => graft.plans.GroupedTopKStrategy)
    e.injectFunction((
      new FunctionIdentifier("dot_product"),
      new ExpressionInfo(classOf[DotProduct].getName, "dot_product"),
      (exprs: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) => {
        require(exprs.length == 2, "dot_product takes exactly 2 arguments")
        DotProduct(exprs(0), exprs(1))
      }))
    e.injectFunction((
      new FunctionIdentifier("sorted_intersect_count"),
      new ExpressionInfo(classOf[SortedIntersectCount].getName, "sorted_intersect_count"),
      (exprs: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) => {
        require(exprs.length == 2, "sorted_intersect_count takes exactly 2 arguments")
        SortedIntersectCount(exprs(0), exprs(1))
      }))
    e.injectFunction((
      new FunctionIdentifier("simhash_bits"),
      new ExpressionInfo(classOf[SimHashBits].getName, "simhash_bits"),
      (exprs: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) => {
        require(exprs.length == 2, "simhash_bits takes (hashes array, numBits literal)")
        val bits = exprs(1) match {
          case org.apache.spark.sql.catalyst.expressions.Literal(v: Int, _) => v
          case other => throw new IllegalArgumentException(
            s"simhash_bits numBits must be an integer literal, got $other")
        }
        SimHashBits(exprs(0), bits)
      }))
    e.injectFunction((
      new FunctionIdentifier("space_saving_topk"),
      new ExpressionInfo(classOf[SpaceSavingTopK].getName, "space_saving_topk"),
      (exprs: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) => {
        require(exprs.length == 3,
          "space_saving_topk takes (item, capacity literal, k literal)")
        def intLit(e: org.apache.spark.sql.catalyst.expressions.Expression,
                   what: String): Int = e match {
          case org.apache.spark.sql.catalyst.expressions.Literal(v: Int, _) => v
          case other => throw new IllegalArgumentException(
            s"space_saving_topk $what must be an integer literal, got $other")
        }
        // returning the AggregateFunction directly — the analyzer wraps it
        // into an AggregateExpression like any registered aggregate
        SpaceSavingTopK(exprs(0), intLit(exprs(1), "capacity"), intLit(exprs(2), "k"))
      }))
  }
}
