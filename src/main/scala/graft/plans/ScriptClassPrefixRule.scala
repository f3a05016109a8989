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
  * (lexicographic unsigned order on both sides — parquet translates
  * OR-of-ranges on one column too), the original equality stays for
  * exactness. Classes whose byte space is one contiguous prefix add two
  * plain conjuncts; p2pk — whose scripts start `21 02`, `21 03`
  * (compressed keys, adjacent so they merge to one range) or `41 04`
  * (uncompressed) — adds one OR-of-ranges conjunct. Only `other` (a
  * complement with no prefix form) is left untouched. Idempotent:
  * conjuncts already present are not re-added, so the fixed-point
  * optimizer batch converges.
  */
object ScriptClassPrefixRule extends Rule[LogicalPlan] with PredicateHelper {

  /** Byte ranges [lo, hi) per class (template sites:
    * ScriptCodec.scriptType; reference `src/main.rs:131-161`).
    */
  private val ranges: Map[String, Seq[(Array[Byte], Array[Byte])]] = {
    def b(xs: Int*): Array[Byte] = xs.map(_.toByte).toArray
    def pfx(xs: Int*): (Array[Byte], Array[Byte]) = {
      val p = b(xs: _*)
      (p, successor(p))
    }
    Map(
      "p2pkh" -> Seq(pfx(0x76, 0xa9, 0x14)),
      "p2sh" -> Seq(pfx(0xa9, 0x14)),
      "p2wpkh" -> Seq(pfx(0x00, 0x14)),
      "p2wsh" -> Seq(pfx(0x00, 0x20)),
      "p2tr" -> Seq(pfx(0x51, 0x20)),
      "op_return" -> Seq(pfx(0x6a)),
      // 0x21 0x02 and 0x21 0x03 are adjacent prefixes: one range
      "p2pk" -> Seq((b(0x21, 0x02), b(0x21, 0x04)), pfx(0x41, 0x04)))
  }

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
      classLiteral(l).filter(ranges.contains).map(c => (st.child, c))
    case EqualTo(l, st: ScriptTypeExpr) =>
      classLiteral(l).filter(ranges.contains).map(c => (st.child, c))
    case _ => None
  }

  private def rangeFor(script: Expression, cls: String): Seq[Expression] = {
    def between(lo: Array[Byte], hi: Array[Byte]): Seq[Expression] = Seq(
      GreaterThanOrEqual(script, Literal(lo, BinaryType)),
      LessThan(script, Literal(hi, BinaryType)))
    ranges(cls) match {
      case Seq((lo, hi)) => between(lo, hi)
      case multi => Seq(multi.map { case (lo, hi) =>
        between(lo, hi).reduce(And) }.reduce(Or))
    }
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
