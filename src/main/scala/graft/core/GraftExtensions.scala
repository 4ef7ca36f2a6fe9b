package graft.core

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.ExpressionInfo
import graft.functions.{CosineSim, PolyHash}

/** SparkSessionExtensions hook registering the engine's native
  * expressions as SQL functions, so `spark.sql("SELECT polyhash(text),
  * cosine_sim(a, b) ...")` works exactly like the Column API — the
  * idiomatic way to extend Spark's function surface (injected via
  * `spark.sql.extensions`, see Sessions.build).
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    // whole-operator extension: plans graft.plans.TopKPerKey logical
    // nodes as the two-phase bounded-heap physical operator
    ext.injectPlannerStrategy(_ => graft.plans.TopKPerKeyStrategy)
    ext.injectFunction((
      FunctionIdentifier("polyhash"),
      new ExpressionInfo(classOf[PolyHash].getName, "polyhash"),
      (children: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) => {
        require(children.length == 1, "polyhash(str) takes 1 argument")
        PolyHash(children.head)
      }))
    ext.injectFunction((
      FunctionIdentifier("cosine_sim"),
      new ExpressionInfo(classOf[CosineSim].getName, "cosine_sim"),
      (children: Seq[org.apache.spark.sql.catalyst.expressions.Expression]) => {
        require(children.length == 2, "cosine_sim(a, b) takes 2 arguments")
        CosineSim(children.head, children(1))
      }))
  }
}
