package graft.plans

import java.util.concurrent.ConcurrentHashMap

import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** Registration of graft's native Catalyst expressions.
  *
  * Two paths:
  *  - [[GraftExtensions]] for sessions built with
  *    `spark.sql.extensions=graft.plans.GraftExtensions` (the idiomatic
  *    SparkSessionExtensions hook);
  *  - [[GraftFunctions.register]] for runtime injection into an existing
  *    session (the harness constructs its own SparkSession, so the query
  *    layer calls this lazily per session).
  */
object GraftFunctions {
  private val registered = ConcurrentHashMap.newKeySet[String]()

  /** True once any session has the native expressions (column builders
    * consult this to pick native vs HOF form at plan-construction time). */
  @volatile var nativeAvailable: Boolean = false

  private[plans] val builders: Seq[(String, Seq[Expression] => Expression)] = Seq(
    "graft_cosine" -> { children =>
      require(children.length == 2, "graft_cosine expects exactly 2 arguments")
      CosineSimilarity(children.head, children(1))
    },
    "graft_simhash" -> { children =>
      require(children.length == 1, "graft_simhash expects exactly 1 argument")
      SimHash64(children.head)
    },
    "graft_sorted_intersect_count" -> { children =>
      require(children.length == 2, "graft_sorted_intersect_count expects exactly 2 arguments")
      SortedIntersectCount(children.head, children(1))
    })

  /** Idempotent per-session registration. Returns true when the native
    * expressions are available in the session. */
  def register(spark: SparkSession): Boolean = {
    val key = System.identityHashCode(spark).toString
    if (registered.contains(key)) true
    else try {
      builders.foreach { case (name, b) =>
        spark.sessionState.functionRegistry.createOrReplaceTempFunction(name, b, "built-in")
      }
      if (!spark.experimental.extraOptimizations.contains(IntersectCountRewrite))
        spark.experimental.extraOptimizations =
          spark.experimental.extraOptimizations :+ IntersectCountRewrite
      registered.add(key)
      nativeAvailable = true
      true
    } catch { case _: Throwable => false }
  }
}

/** `spark.sql.extensions` entry point. */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    GraftFunctions.builders.foreach { case (name, b) =>
      ext.injectFunction((FunctionIdentifier(name),
        new ExpressionInfo(classOf[CosineSimilarity].getName, name), b))
    }
    ext.injectOptimizerRule(_ => IntersectCountRewrite)
  }
}
