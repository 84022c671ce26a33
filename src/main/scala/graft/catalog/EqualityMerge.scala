package graft.catalog

import org.apache.spark.sql.{Row, SparkSession}
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.parser.ParserInterface
import org.apache.spark.sql.catalyst.plans.QueryPlan
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.analysis.{UnresolvedAttribute, UnresolvedRelation}
import org.apache.spark.sql.connector.catalog.{Identifier, TableCatalog}
import org.apache.spark.sql.execution.command.LeafRunnableCommand
import org.apache.spark.sql.types.LongType

/** Routes an UPSERT-SHAPED `MERGE INTO` through the equality-delete commit
  * instead of the row-level delta plan, when the target opts in with
  * `write.merge.mode = 'equality'`.
  *
  * A delta MERGE must SCAN the target to locate matched rows — O(matched
  * files) of read work even with runtime file pruning. When the MERGE is an
  * upsert on a fixed key (ON clause = key equality, UPDATE SET ≡ INSERT
  * VALUES — including the `UPDATE SET * / INSERT *` sugar), the result is
  * fully determined by the source batch alone: append the rows and
  * equality-delete their keys. Commit cost O(batch) — on a 100 TB target
  * the difference between touching every matching file and touching none.
  *
  * Interception happens at PARSE time: Spark's analyzer consumes a resolved
  * `MergeIntoTable` into its row-level plan within a single fixed-point
  * iteration, before any injected resolution rule can see it, so the only
  * clean seam is the parser (`injectParser`). The rewrite is conservative —
  * any condition, DELETE action, asymmetric assignment, not-matched-by-
  * source clause, or shape we can't prove syntactically falls through to
  * the standard delta path untouched.
  */
final class EqualityMergeParser(
    session: SparkSession,
    delegate: ParserInterface) extends ParserInterface {

  override def parsePlan(sqlText: String): LogicalPlan =
    EqualityMergeRewrite(session, delegate.parsePlan(sqlText))

  override def parseExpression(sqlText: String): Expression =
    delegate.parseExpression(sqlText)
  override def parseTableIdentifier(sqlText: String): org.apache.spark.sql.catalyst.TableIdentifier =
    delegate.parseTableIdentifier(sqlText)
  override def parseFunctionIdentifier(sqlText: String): org.apache.spark.sql.catalyst.FunctionIdentifier =
    delegate.parseFunctionIdentifier(sqlText)
  override def parseMultipartIdentifier(sqlText: String): Seq[String] =
    delegate.parseMultipartIdentifier(sqlText)
  override def parseTableSchema(sqlText: String): org.apache.spark.sql.types.StructType =
    delegate.parseTableSchema(sqlText)
  override def parseDataType(sqlText: String): org.apache.spark.sql.types.DataType =
    delegate.parseDataType(sqlText)
  override def parseQuery(sqlText: String): LogicalPlan =
    delegate.parseQuery(sqlText)
  override def parseRoutineParam(sqlText: String): org.apache.spark.sql.types.StructType =
    delegate.parseRoutineParam(sqlText)
}

object EqualityMergeRewrite {

  def apply(session: SparkSession, plan: LogicalPlan): LogicalPlan = plan match {
    case m: MergeIntoTable if !m.withSchemaEvolution &&
        m.notMatchedBySourceActions.isEmpty =>
      try rewrite(session, m).getOrElse(m)
      catch { case _: Exception => m } // any doubt → standard path
    case other => other
  }

  /** (alias-or-table qualifier names, relation parts) of an unresolved
    * MERGE side.
    */
  private def namesOf(p: LogicalPlan): (Set[String], Option[Seq[String]]) = p match {
    case SubqueryAlias(ident, child) =>
      val (inner, parts) = namesOf(child)
      (inner + ident.name.toLowerCase, parts)
    case u: UnresolvedRelation =>
      (Set(u.multipartIdentifier.last.toLowerCase), Some(u.multipartIdentifier))
    case _ => (Set.empty, None)
  }

  private def lastName(e: Expression): Option[(String, String)] = e match {
    case a: UnresolvedAttribute if a.nameParts.size >= 2 =>
      Some(a.nameParts.init.last.toLowerCase -> a.nameParts.last.toLowerCase)
    case _ => None
  }

  private def rewrite(session: SparkSession, m: MergeIntoTable): Option[LogicalPlan] = {
    val (targetNames, targetParts) = namesOf(m.targetTable)
    val parts = targetParts.getOrElse(return None)
    // resolve the target through the catalog manager NOW (parse time): the
    // rewrite only applies to equality-mode lake tables
    val cm = session.sessionState.catalogManager
    val (cat, ident) = parts match {
      case Seq(c, ns, t) if cm.isCatalogRegistered(c) =>
        (cm.catalog(c), Identifier.of(Array(ns), t))
      case Seq(ns, t) => (cm.currentCatalog, Identifier.of(Array(ns), t))
      case _ => return None
    }
    val table = cat match {
      case tc: TableCatalog if tc.tableExists(ident) => tc.loadTable(ident)
      case _ => return None
    }
    val lake = table match {
      case l: LakeTable if l.meta.properties.get("write.merge.mode").contains("equality") => l
      case _ => return None
    }
    val cols = lake.meta.schema.fieldNames.toSeq
    val colSet = cols.map(_.toLowerCase).toSet

    // ON clause: conjunction of targetCol = sourceExpr (qualified on the
    // target side so we can attribute it syntactically)
    def keyPairs(e: Expression): Option[Seq[(String, Expression)]] = e match {
      case And(l, r) => for (a <- keyPairs(l); b <- keyPairs(r)) yield a ++ b
      case EqualTo(l, r) =>
        (lastName(l), lastName(r)) match {
          case (Some((q, c)), _) if targetNames(q) && colSet(c) &&
            !lastName(r).exists(x => targetNames(x._1)) => Some(Seq(c -> r))
          case (_, Some((q, c))) if targetNames(q) && colSet(c) &&
            !lastName(l).exists(x => targetNames(x._1)) => Some(Seq(c -> l))
          case _ => None
        }
      case _ => None
    }
    val pairs = keyPairs(m.mergeCondition).getOrElse(return None)
    if (pairs.isEmpty) return None
    val keyExpr = pairs.toMap

    def assignMap(assigns: Seq[Assignment]): Option[Map[String, Expression]] = {
      val m0 = assigns.flatMap(a => a.key match {
        case attr: UnresolvedAttribute => Some(attr.nameParts.last.toLowerCase -> a.value)
        case _ => None
      }).toMap
      if (m0.size == assigns.size) Some(m0) else None
    }

    // exactly one unconditional UPDATE and one unconditional INSERT,
    // assigning every target column identically — the upsert shape.
    // `UPDATE SET * / INSERT *` is symmetric by construction: both assign
    // every target column from the same-named source column.
    val perColumn: Map[String, Expression] =
      (m.matchedActions, m.notMatchedActions) match {
        case (Seq(UpdateStarAction(None)), Seq(InsertStarAction(None))) =>
          // star assigns key columns from the same-named source column, so
          // the ON clause's source side must BE that bare column — anything
          // else (t.k = s.j) would move the key and strand the old version
          if (!keyExpr.forall { case (c, e) => e match {
            case a: UnresolvedAttribute => a.nameParts.last.toLowerCase == c
            case _ => false
          } }) return None
          cols.map(c => c.toLowerCase ->
            (UnresolvedAttribute(Seq(c)): Expression)).toMap
        case (Seq(UpdateAction(None, u, _)), Seq(InsertAction(None, i))) =>
          val um = assignMap(u).getOrElse(return None)
          val im = assignMap(i).getOrElse(return None)
          if (um.keySet != colSet || im.keySet != colSet) return None
          if (!cols.forall(c => um(c.toLowerCase) == im(c.toLowerCase))) return None
          // key columns must be assigned exactly the expression the ON
          // clause equates them with — otherwise the "update" would move
          // the key and the old key's version would survive
          if (!keyExpr.forall { case (c, e) => im.get(c).contains(e) }) return None
          im
        case _ => return None
      }

    val keys = cols.filter(c => keyExpr.contains(c.toLowerCase))
    val tableName = (cat.name() +: ident.namespace() :+ ident.name()).mkString(".")
    // project the source into the target's schema; PlanShim analyzes it at
    // execution, so the unresolved column references bind against `source`
    val project = Project(
      cols.map(c => Alias(perColumn(c.toLowerCase), c)()), m.sourceTable)
    Some(EqualityMergeCommand(tableName, project, keys))
  }
}

/** The rewritten MERGE: executes the source projection as the upsert batch
  * (append + eq-delete keys, one CAS delta commit — no target scan).
  */
final case class EqualityMergeCommand(
    table: String,
    source: LogicalPlan,
    keys: Seq[String]) extends LeafRunnableCommand {

  override def innerChildren: Seq[QueryPlan[_]] = Seq(source)
  override val output: Seq[Attribute] = Seq(
    AttributeReference("upserted_rows", LongType, nullable = false)(),
    AttributeReference("snapshot_id", LongType, nullable = false)())

  override def run(spark: SparkSession): Seq[Row] = {
    val df = org.apache.spark.sql.graft.PlanShim.ofRows(spark, source)
    val (n, sid) = LakeMaintenance.upsert(spark, table, df, keys)
    Seq(Row(n, sid))
  }
}
