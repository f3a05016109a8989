package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.{Filter, LogicalPlan}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{BinaryType, StringType}
import org.apache.spark.unsafe.types.UTF8String

import graft.functions.ScriptTypeExpr

/** Optimizer rule making script-class predicates sargable.
  *
  * `script_type(script) = 'p2pkh'` is an opaque function call: the
  * parquet reader cannot use it, so every row group is read and the
  * classifier runs over all 177M rows. But each script class is defined
  * by a fixed byte prefix (e.g. p2pkh scripts all start `76a914`), and
  * the UTXO parquet is sorted by `script` (reference layout,
  * `src/main.rs:212`) with per-page statistics — a *binary range*
  * predicate on `script` row-group-skips straight to the class's
  * contiguous slice.
  *
  * The rule appends the implied (redundant, thus semantics-preserving)
  * range conjuncts: `script_type(s) = 'p2pkh'` becomes
  * `script_type(s) = 'p2pkh' AND s >= X'76a914' AND s < X'76a915'`.
  * Spark pushes the binary comparisons to the parquet scan
  * (lexicographic unsigned order on both sides), the original equality
  * stays for exactness, and classes without a single contiguous prefix
  * (p2pk: two key-parity prefixes; other: complement) are left
  * untouched. Idempotent: conjuncts already present are not re-added,
  * so the fixed-point optimizer batch converges.
  */
object ScriptClassPrefixRule extends Rule[LogicalPlan] with PredicateHelper {

  /** Classes with one contiguous prefix (template sites:
    * ScriptCodec.scriptType; reference `src/main.rs:131-161`).
    */
  private val prefixes: Map[String, Array[Byte]] = Map(
    "p2pkh" -> Array(0x76, 0xa9, 0x14).map(_.toByte),
    "p2sh" -> Array(0xa9, 0x14).map(_.toByte),
    "p2wpkh" -> Array(0x00, 0x14).map(_.toByte),
    "p2wsh" -> Array(0x00, 0x20).map(_.toByte),
    "p2tr" -> Array(0x51, 0x20).map(_.toByte),
    "op_return" -> Array(0x6a).map(_.toByte))

  /** Smallest byte string strictly greater than every string with this
    * prefix (increment of the last byte; none of our prefixes end 0xff).
    */
  private def successor(p: Array[Byte]): Array[Byte] = {
    val s = p.clone()
    s(s.length - 1) = (s(s.length - 1) + 1).toByte
    s
  }

  private def classLiteral(e: Expression): Option[String] = e match {
    case Literal(s: UTF8String, StringType) => Option(s).map(_.toString)
    case _ => None
  }

  /** The (script, class) pair of a `script_type(script) = 'class'`
    * equality, either operand order, for prefix-rangeable classes only.
    */
  private def classEquality(e: Expression): Option[(Expression, String)] = e match {
    case EqualTo(st: ScriptTypeExpr, l) =>
      classLiteral(l).filter(prefixes.contains).map(c => (st.child, c))
    case EqualTo(l, st: ScriptTypeExpr) =>
      classLiteral(l).filter(prefixes.contains).map(c => (st.child, c))
    case _ => None
  }

  private def rangeFor(script: Expression, cls: String): Seq[Expression] = {
    val p = prefixes(cls)
    Seq(
      GreaterThanOrEqual(script, Literal(p, BinaryType)),
      LessThan(script, Literal(successor(p), BinaryType)))
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan transform {
    case f @ Filter(cond, child) =>
      val conjuncts = splitConjunctivePredicates(cond)
      val additions = conjuncts.flatMap(classEquality).distinct.flatMap {
        case (script, cls) =>
          rangeFor(script, cls).filterNot(r => conjuncts.exists(_.semanticEquals(r)))
      }
      if (additions.isEmpty) f
      else Filter((conjuncts ++ additions).reduce(And), child)
  }
}
