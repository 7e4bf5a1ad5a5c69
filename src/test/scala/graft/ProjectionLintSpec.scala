package graft

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan

/** Projection-collapse lint over every declared query's OPTIMIZED plan.
  *
  * CollapseProject inlines single-use aliases; when the use site is
  * inside a higher-order-function lambda, an O(array) expression that
  * was computed once per ROW becomes once per ELEMENT — O(dim²)/row —
  * and the collapsed mega-projection falls out of whole-stage codegen.
  * Three real taxes of exactly this shape were found by hand in r11
  * (semDedupPairs' maxabs, quantizeInt8/simSearchPrenorm's norm
  * aliases, llm_normalize's clean chain); this sweep makes the class
  * un-reintroducible: new queries fail here unless the amplification
  * is either fixed (pin the alias as a plain attribute — checkpoint or
  * intermediate action) or consciously added to the exception table
  * with a why.
  *
  * Two patterns, both on the optimized plan (post-CollapseProject):
  *  1. INVARIANT-IN-LAMBDA: a nested HOF inside a lambda body that
  *     references none of the enclosing lambda's variables — loop-
  *     invariant work evaluated per element.
  *  2. DUPLICATED-HOF: the same canonicalized HOF subtree appearing
  *     ≥2 times among one plan node's expressions — a collapsed alias
  *     re-evaluated at every former use site (codegen subexpression
  *     elimination does not always rescue this: lambda bodies and
  *     interpreted projections evaluate each copy).
  */
class ProjectionLintSpec extends SparkSpec {

  /** Queries allowed to carry a finding, with the measured/analyzed
    * reason. Keep this list SHORT and justified — every entry is a
    * known tax or a proven non-tax. */
  private val exceptions: Map[String, String] = Map(
  )

  private def invariantInLambda(e: Expression): Seq[String] = {
    val out = scala.collection.mutable.ListBuffer[String]()
    e.foreach {
      case hof: HigherOrderFunction =>
        hof.functions.foreach {
          case lf: LambdaFunction =>
            val bound = lf.arguments.map(_.exprId).toSet
            lf.function.foreach {
              case inner: HigherOrderFunction =>
                val usesOuter = inner.exists {
                  case v: NamedLambdaVariable => bound.contains(v.exprId)
                  case _ => false
                }
                if (!usesOuter)
                  out += s"invariant ${inner.prettyName}(..) inside ${hof.prettyName} lambda"
              case _ => ()
            }
          case _ => ()
        }
      case _ => ()
    }
    out.toList.distinct
  }

  private def duplicatedHofs(node: LogicalPlan): Seq[String] = {
    val hofs = node.expressions.flatMap(_.collect {
      case h: HigherOrderFunction => h
    })
    hofs.groupBy(_.canonicalized).collect {
      case (h, occ) if occ.size >= 2 =>
        s"${occ.head.prettyName}(..) x${occ.size} in ${node.nodeName}"
    }.toSeq
  }

  private def lint(plan: LogicalPlan): Seq[String] =
    (plan.collect { case node =>
      node.expressions.flatMap(invariantInLambda) ++ duplicatedHofs(node)
    }).flatten.distinct

  test("no query's optimized plan amplifies work through projection collapse") {
    val findings = SparkEntry.queries.toSeq.sortBy(_._1).flatMap {
      case (name, fn) =>
        val msgs =
          try lint(fn(spark, sf).queryExecution.optimizedPlan)
          catch { case e: Throwable => Seq(s"lint error: ${e.getMessage}") }
        if (msgs.isEmpty) None else Some(name -> msgs)
    }
    val unexcused = findings.filterNot { case (n, _) => exceptions.contains(n) }
    val stale = exceptions.keySet -- findings.map(_._1).toSet
    assert(unexcused.isEmpty,
      "projection-collapse amplification (pin the alias as a plain " +
        "attribute, or add a justified exception):\n" +
        unexcused.map { case (n, ms) => s"  $n:\n    ${ms.mkString("\n    ")}" }
          .mkString("\n"))
    assert(stale.isEmpty,
      s"exception entries no longer firing (delete them): $stale")
  }
}
