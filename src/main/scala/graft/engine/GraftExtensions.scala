package graft.engine

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Cast, Expression, ExpressionInfo}
import org.apache.spark.sql.types.LongType

import org.apache.spark.sql.graftx.{CosineSim, LshBuckets, SimhashAgg, VecSumAgg, ZValue}

/** SparkSessionExtensions registration for the engine's native
  * expressions, making them available to SQL text as `cosine_sim(a, b)`
  * and `zvalue(bits, col…)` (SURVEY.md §4.3; extension point:
  * `SparkSession.builder.withExtensions` or
  * `spark.sql.extensions=graft.engine.GraftExtensions`).
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  override def apply(e: SparkSessionExtensions): Unit = {
    e.injectFunction((
      FunctionIdentifier("cosine_sim"),
      new ExpressionInfo(classOf[CosineSim].getName, "cosine_sim"),
      (exprs: Seq[Expression]) => CosineSim(exprs(0), exprs(1))))

    e.injectFunction((
      FunctionIdentifier("simhash_agg"),
      new ExpressionInfo(classOf[SimhashAgg].getName, "simhash_agg"),
      (exprs: Seq[Expression]) => SimhashAgg(exprs.head)))

    e.injectFunction((
      FunctionIdentifier("vec_sum_agg"),
      new ExpressionInfo(classOf[VecSumAgg].getName, "vec_sum_agg"),
      (exprs: Seq[Expression]) => VecSumAgg(exprs.head)))

    e.injectFunction((
      FunctionIdentifier("lsh_buckets"),
      new ExpressionInfo(classOf[LshBuckets].getName, "lsh_buckets"),
      (exprs: Seq[Expression]) => {
        require(exprs.size == 3 && exprs(1).foldable && exprs(2).foldable,
          "usage: lsh_buckets(vec, planesLiteral, tablesLiteral)")
        LshBuckets(exprs.head,
          exprs(1).eval().asInstanceOf[Number].intValue(),
          exprs(2).eval().asInstanceOf[Number].intValue())
      }))

    e.injectFunction((
      FunctionIdentifier("zvalue"),
      new ExpressionInfo(classOf[ZValue].getName, "zvalue"),
      (exprs: Seq[Expression]) => {
        require(exprs.size >= 2 && exprs.head.foldable,
          "usage: zvalue(bitsLiteral, col, ...)")
        val bits = exprs.head.eval().asInstanceOf[Number].intValue()
        ZValue(exprs.tail.map(c => Cast(c, LongType)).toIndexedSeq, bits)
      }))
  }
}
