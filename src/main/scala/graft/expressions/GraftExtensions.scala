package graft.expressions

import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** Catalyst extension point: registers the engine's native expressions
  * as SQL functions.
  *
  * Two registration paths:
  *  - config: `spark.sql.extensions=graft.expressions.GraftExtensions`
  *    (GraftSession sets this) — the standard plugin route;
  *  - runtime: `GraftExtensions.register(spark)` for sessions built
  *    elsewhere (Verify/Bench, tests).
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    GraftExtensions.functions.foreach { case (ident, info, builder) =>
      ext.injectFunction((ident, info, builder))
    }
    ext.injectOptimizerRule(_ => CartesianGuard)
    ext.injectPlannerStrategy(_ => graft.plans.TopKStrategy)
  }
}

object GraftExtensions {

  private val functions: Seq[(FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression)] = Seq(
    (FunctionIdentifier("graft_dot"),
      new ExpressionInfo(classOf[FloatDot].getName, "graft_dot"),
      (children: Seq[Expression]) => FloatDot(children.head, children(1))),
    (FunctionIdentifier("graft_intersect_count"),
      new ExpressionInfo(classOf[LongArrayIntersectCount].getName, "graft_intersect_count"),
      (children: Seq[Expression]) => LongArrayIntersectCount(children.head, children(1))),
    (FunctionIdentifier("graft_cms_estimate"),
      new ExpressionInfo(classOf[CmsEstimate].getName, "graft_cms_estimate"),
      (children: Seq[Expression]) => CmsEstimate(children.head, children(1))),
    (FunctionIdentifier("graft_shingle_hashes"),
      new ExpressionInfo(classOf[ShingleHashes].getName, "graft_shingle_hashes"),
      (children: Seq[Expression]) => ShingleHashes(children.head, children(1),
        if (children.size > 2) children(2)
        else org.apache.spark.sql.catalyst.expressions.Literal(31))),
    (FunctionIdentifier("graft_shingle_hash_list"),
      new ExpressionInfo(classOf[ShingleHashList].getName, "graft_shingle_hash_list"),
      (children: Seq[Expression]) => ShingleHashList(children.head, children(1))),
    (FunctionIdentifier("graft_hash64"),
      new ExpressionInfo(classOf[Hash64].getName, "graft_hash64"),
      (children: Seq[Expression]) => Hash64(children.head)),
    (FunctionIdentifier("graft_tri_products"),
      new ExpressionInfo(classOf[TriQuantProducts].getName, "graft_tri_products"),
      (children: Seq[Expression]) => TriQuantProducts(children.head)),
    (FunctionIdentifier("graft_nfc"),
      new ExpressionInfo(classOf[NfcNormalize].getName, "graft_nfc"),
      (children: Seq[Expression]) => NfcNormalize(children.head)),
    (FunctionIdentifier("graft_jaro_winkler"),
      new ExpressionInfo(classOf[JaroWinkler].getName, "graft_jaro_winkler"),
      (children: Seq[Expression]) => JaroWinkler(children.head, children(1))),
    (FunctionIdentifier("graft_minhash_bands"),
      new ExpressionInfo(classOf[MinhashBands].getName, "graft_minhash_bands"),
      (children: Seq[Expression]) => MinhashBands(children.head, children(1), children(2))),
    (FunctionIdentifier("graft_gear_chunks"),
      new ExpressionInfo(classOf[GearChunks].getName, "graft_gear_chunks"),
      (children: Seq[Expression]) => GearChunks(children.head, children(1))),
    (FunctionIdentifier("graft_multi_match"),
      new ExpressionInfo(classOf[MultiMatch].getName, "graft_multi_match"),
      (children: Seq[Expression]) => MultiMatch(children.head, children(1))),
    (FunctionIdentifier("graft_simhash"),
      new ExpressionInfo(classOf[Simhash].getName, "graft_simhash"),
      (children: Seq[Expression]) => Simhash(children.head, children(1))),
    (FunctionIdentifier("graft_triples"),
      new ExpressionInfo(classOf[ArrayTriples].getName, "graft_triples"),
      (children: Seq[Expression]) => ArrayTriples(children.head)),
    (FunctionIdentifier("graft_top_k_longs"),
      new ExpressionInfo(classOf[TopKSmallestLongs].getName, "graft_top_k_longs"),
      (children: Seq[Expression]) => TopKSmallestLongs(children.head, children(1))),
    (FunctionIdentifier("graft_pairs_long"),
      new ExpressionInfo(classOf[ArrayPairsLong].getName, "graft_pairs_long"),
      (children: Seq[Expression]) => ArrayPairsLong(children.head)),
    (FunctionIdentifier("graft_pairs_str"),
      new ExpressionInfo(classOf[ArrayPairsString].getName, "graft_pairs_str"),
      (children: Seq[Expression]) => ArrayPairsString(children.head)),
    (FunctionIdentifier("graft_cross_long"),
      new ExpressionInfo(classOf[CrossPairsLong].getName, "graft_cross_long"),
      (children: Seq[Expression]) => CrossPairsLong(children.head, children(1))),
    (FunctionIdentifier("graft_max_any"),
      new ExpressionInfo(classOf[MaxAny].getName, "graft_max_any"),
      (children: Seq[Expression]) => MaxAny(children.head)),
    (FunctionIdentifier("graft_min_any"),
      new ExpressionInfo(classOf[MinAny].getName, "graft_min_any"),
      (children: Seq[Expression]) => MinAny(children.head)))

  /** Idempotently register the functions (and the CartesianGuard
    * optimizer rule, via the runtime `extraOptimizations` hook) on an
    * existing session.
    */
  def register(spark: SparkSession): Unit = {
    functions.foreach { case (ident, info, builder) =>
      spark.sessionState.functionRegistry.registerFunction(ident, info, builder)
    }
    if (!spark.experimental.extraOptimizations.contains(CartesianGuard))
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations :+ CartesianGuard
    graft.plans.TopKPerKey.registerStrategy(spark)
  }
}
