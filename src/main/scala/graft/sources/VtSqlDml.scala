package graft.sources

import org.apache.spark.sql.{Row, SparkSession}
import org.apache.spark.sql.catalyst.analysis.{UnresolvedAttribute, UnresolvedRelation}
import org.apache.spark.sql.catalyst.expressions.{Expression, PlanExpression}
import org.apache.spark.sql.catalyst.parser.ParserInterface
import org.apache.spark.sql.catalyst.plans.logical.{Assignment, DeleteAction, DeleteFromTable, InsertAction, InsertStarAction, LogicalPlan, MergeAction, MergeIntoTable, SubqueryAlias, UpdateAction, UpdateStarAction, UpdateTable}
import org.apache.spark.sql.execution.command.LeafRunnableCommand
import org.apache.spark.sql.graft.SessionShim
import org.apache.spark.sql.types.{DataType, StructType}

import graft.vt.{Commit, MergeClause, VersionedTable}

/** SQL-text DML (`UPDATE` / `MERGE INTO` / `DELETE FROM`) over versioned
  * tables, translated from the PARSED (unresolved) statement straight onto
  * the engine's row-level operations — the same architecture Delta ships
  * (its OSS DML is rule-level translation, not `SupportsRowLevelOperations`).
  * Two entry points share one translator:
  *
  *  - [[VtSqlDml.exec]] — programmatic, works on ANY session (no build-time
  *    extensions): parse the statement, recognize a vt-catalog target from
  *    the `spark.sql.catalog.<name>` runtime conf, run the engine op.
  *  - [[graft.functions.GraftExtensions]] injects [[GraftSqlParser]], which
  *    intercepts the same three statement shapes at parse time so literal
  *    `spark.sql("MERGE INTO vt.\`path\` …")` works in extension sessions
  *    (`DELETE FROM` additionally works WITHOUT extensions through
  *    [[VtTable]]'s `SupportsDelete`, for translatable predicates).
  *
  * Because the plan is unresolved, expressions still carry the user's own
  * qualifiers, so rendering them back to engine SQL text (`Expression.sql`)
  * is an exact round trip: UPDATE/DELETE strip the single table alias (the
  * engine evaluates against the bare scan), MERGE keeps both aliases and
  * passes them through to [[VersionedTable.mergeInto]]'s joined frame.
  * Subqueries in conditions are refused loudly (the engine ops take
  * row-local predicates); `WHEN MATCHED THEN UPDATE SET *` / `INSERT *`
  * expand against the target's commit schema — or, under `MERGE WITH
  * SCHEMA EVOLUTION`, against the SOURCE's columns (Delta's rule), with
  * source-only columns widening the target schema nullable. */
object VtSqlDml {

  /** Execute one DML statement against a vt-catalog table; the commit it
    * landed. Works on any session — the catalog binds via runtime conf. */
  def exec(spark: SparkSession, sql: String): Commit =
    run(spark, spark.sessionState.sqlParser.parsePlan(sql)).getOrElse(
      throw new IllegalArgumentException(
        s"not an UPDATE/MERGE/DELETE statement on a vt-catalog table: $sql"))

  /** Is this parsed plan a DML statement this bridge handles? (Pure string
    * inspection — nothing is opened or validated yet.) */
  def translatable(spark: SparkSession, plan: LogicalPlan): Boolean = plan match {
    case DeleteFromTable(t, _) => addressOf(spark, t).isDefined
    case UpdateTable(t, _, _) => addressOf(spark, t).isDefined
    case m: MergeIntoTable => addressOf(spark, m.targetTable).isDefined
    case _ => false
  }

  /** Translate + run a parsed DML plan; None when it is not DML over a
    * vt-catalog table (the caller then plans it normally). */
  def run(spark: SparkSession, plan: LogicalPlan): Option[Commit] = plan match {
    case DeleteFromTable(t, cond) =>
      addressOf(spark, t).map { case (path, branch, alias) =>
        val vt = VersionedTable.open(SourcePaths.local(path))
        val where = renderLocal(cond, alias)
        val message = s"SQL DELETE FROM $path WHERE $where"
        if (spark.conf.get("spark.graft.vt.delete.mode", "cow") == "mor")
          vt.deleteWithVectors(spark, where, branch, message)
        else vt.delete(spark, where, branch, message)
      }
    case UpdateTable(t, assignments, cond) =>
      addressOf(spark, t).map { case (path, branch, alias) =>
        val vt = VersionedTable.open(SourcePaths.local(path))
        val set = assignments.map(a =>
          columnOf(a.key, alias) -> renderLocal(a.value, alias)).toMap
        require(set.size == assignments.size,
          "UPDATE assigns the same column more than once")
        val where = cond.map(renderLocal(_, alias)).getOrElse("true")
        vt.update(spark, where, set, branch,
          s"SQL UPDATE $path SET (${set.keys.toSeq.sorted.mkString(", ")}) WHERE $where")
      }
    case m: MergeIntoTable =>
      addressOf(spark, m.targetTable).map { case (path, branch, tAliasOpt) =>
        val vt = VersionedTable.open(SourcePaths.local(path))
        val tAlias = tAliasOpt.getOrElse("t")
        val (srcPlan, sAliasOpt) = m.sourceTable match {
          case SubqueryAlias(id, child) => (child, Some(id.name))
          case other => (other, None)
        }
        val sAlias = sAliasOpt.getOrElse("s")
        val head = vt.head(branch).getOrElse(
          throw new IllegalArgumentException(s"no such branch: $branch"))
        val targetCols = DataType.fromJson(head.schemaJson)
          .asInstanceOf[StructType].fieldNames.toIndexedSeq
        val srcDf = SessionShim.ofRows(spark, srcPlan)
        // `SET *` / `INSERT *`: without evolution, every target column is
        // star-assigned from its same-named source column (a source lacking
        // one is an analysis error, as in Delta). WITH SCHEMA EVOLUTION the
        // star expands over the SOURCE's column set instead (Delta's rule):
        // source-only columns are assigned into the widened schema, and
        // target-only columns stay unassigned — kept on update, null on
        // insert.
        def starAssigns: Map[String, String] =
          (if (m.withSchemaEvolution)
             // a source column matching a target column case-INSENSITIVELY
             // star-assigns the TARGET's spelling (Spark's default resolver;
             // a case-variant must never mint a second column)
             srcDf.columns.toIndexedSeq.map(c =>
               targetCols.find(_.equalsIgnoreCase(c)).getOrElse(c) -> s"`$sAlias`.`$c`")
           else targetCols.map(c => c -> s"`$sAlias`.`$c`")).toMap
        def clauseOf(a: MergeAction): MergeClause = a match {
          case UpdateAction(c, assigns, _) =>
            MergeClause.update(assigns.map(asn =>
              columnOf(asn.key, Some(tAlias)) -> render(asn.value)).toMap, c.map(render))
          case DeleteAction(c) => MergeClause.delete(c.map(render))
          case InsertAction(c, assigns) =>
            MergeClause.insert(assigns.map(asn =>
              columnOf(asn.key, Some(tAlias)) -> render(asn.value)).toMap, c.map(render))
          case UpdateStarAction(c) => MergeClause.update(starAssigns, c.map(render))
          case InsertStarAction(c) => MergeClause.insert(starAssigns, c.map(render))
          case other => throw new IllegalArgumentException(
            s"unsupported MERGE action: $other")
        }
        vt.mergeInto(spark, srcDf, render(m.mergeCondition),
          matched = m.matchedActions.map(clauseOf),
          notMatched = m.notMatchedActions.map(clauseOf),
          notMatchedBySource = m.notMatchedBySourceActions.map(clauseOf),
          targetAlias = tAlias, sourceAlias = sAlias, branch = branch,
          message = s"SQL MERGE INTO $path ON ${render(m.mergeCondition)}",
          schemaEvolution = m.withSchemaEvolution)
      }
    case _ => None
  }

  /** The DML target when it is `<vt catalog>.<[branch@]path>` (optionally
    * aliased): (path, branch, alias). Pure parsing — nothing opened. */
  private def addressOf(spark: SparkSession, plan: LogicalPlan)
      : Option[(String, String, Option[String])] = plan match {
    case SubqueryAlias(id, child) =>
      addressOf(spark, child).map { case (p, b, _) => (p, b, Some(id.name)) }
    case u: UnresolvedRelation if u.multipartIdentifier.length == 2 &&
        spark.conf.getOption("spark.sql.catalog." + u.multipartIdentifier.head)
          .contains(classOf[VtCatalog].getName) =>
      val (branch, path) = VtAddress.split(u.multipartIdentifier(1))
      Some((path, branch, None))
    case _ => None
  }

  private def refuseSubqueries(e: Expression): Unit =
    require(!e.exists(_.isInstanceOf[PlanExpression[_]]),
      s"subqueries are not supported in vt DML conditions: ${e.sql} — " +
        "materialize the subquery as a MERGE source instead")

  /** Render for the SINGLE-table ops (UPDATE/DELETE): the engine evaluates
    * against the bare scan, so the statement's table alias is stripped
    * from every qualified attribute before `.sql`. */
  private def renderLocal(e: Expression, alias: Option[String]): String = {
    refuseSubqueries(e)
    val stripped = alias match {
      case Some(a) => e.transform {
        case u: UnresolvedAttribute
            if u.nameParts.length > 1 && u.nameParts.head.equalsIgnoreCase(a) =>
          UnresolvedAttribute(u.nameParts.tail)
      }
      case None => e
    }
    stripped.sql
  }

  /** Render for MERGE expressions: aliases pass through untouched — they
    * are exactly the qualifiers [[VersionedTable.mergeInto]]'s joined
    * frame resolves. */
  private def render(e: Expression): String = { refuseSubqueries(e); e.sql }

  /** An assignment key → bare target column name; a qualifier, when
    * present, must be the target's alias. */
  private def columnOf(key: Expression, alias: Option[String]): String = key match {
    case u: UnresolvedAttribute =>
      require(u.nameParts.length == 1 ||
        (u.nameParts.length == 2 && alias.exists(_.equalsIgnoreCase(u.nameParts.head))),
        s"assignment must target a column of the target table, got ${u.sql}")
      u.nameParts.last
    case other => throw new IllegalArgumentException(
      s"assignment must target a column, got ${other.sql}")
  }
}

/** The execution node [[GraftSqlParser]] plants for an intercepted DML
  * statement: a leaf command holding the PARSED plan (kept unresolved —
  * the translator resolves addresses and expressions itself), run through
  * [[VtSqlDml.run]] when the command executes. */
case class VtDmlCommand(dml: LogicalPlan, sqlText: String) extends LeafRunnableCommand {
  override def run(sparkSession: SparkSession): Seq[Row] = {
    VtSqlDml.run(sparkSession, dml).getOrElse(throw new IllegalStateException(
      s"VtDmlCommand planted for a non-translatable statement: $sqlText"))
    Seq.empty
  }
  override def simpleString(maxFields: Int): String =
    s"VtDmlCommand ${sqlText.linesIterator.mkString(" ").take(120)}"
}

/** Parser injected by [[graft.functions.GraftExtensions]]: delegates
  * everything to Spark's parser, then routes the three DML statement
  * shapes over vt-catalog tables into [[VtDmlCommand]] — making literal
  * `spark.sql("UPDATE/MERGE/DELETE …")` work where Spark would otherwise
  * demand `SupportsRowLevelOperations`. Non-vt statements pass through
  * byte-identical. */
final class GraftSqlParser(spark: SparkSession, delegate: ParserInterface)
    extends ParserInterface {

  override def parsePlan(sqlText: String): LogicalPlan =
    try {
      val plan = delegate.parsePlan(sqlText)
      if (VtSqlDml.translatable(spark, plan)) VtDmlCommand(plan, sqlText)
      // DESCRIBE HISTORY is the one utility statement Spark's grammar
      // accepts (as a describe-column of a table named `history`) — on a
      // vt-catalog address that native plan can only fail analysis, so
      // routing it to the lineage command shadows nothing that works
      else if (sqlText.trim.take(4).equalsIgnoreCase("DESC"))
        VtUtilitySql.parse(spark, sqlText) match {
          case Some(stmt: VtUtilitySql.HistoryStmt) => VtUtilityCommand(stmt, sqlText)
          case Some(stmt: VtUtilitySql.DetailStmt) => VtUtilityCommand(stmt, sqlText)
          case _ => plan
        }
      else plan
    } catch {
      // Utility statements (VACUUM / DESCRIBE HISTORY / OPTIMIZE / RESTORE
      // TABLE) are not in Spark's grammar, so they are offered to the vt
      // mini-parser only AFTER the delegate throws — a statement Spark
      // understands can never be shadowed, and non-vt text keeps its
      // original parse error.
      case e: org.apache.spark.sql.catalyst.parser.ParseException =>
        VtUtilitySql.parse(spark, sqlText).map(VtUtilityCommand(_, sqlText))
          .getOrElse(throw e)
    }

  override def parseQuery(sqlText: String): LogicalPlan = delegate.parseQuery(sqlText)
  override def parseExpression(sqlText: String): Expression =
    delegate.parseExpression(sqlText)
  override def parseTableIdentifier(sqlText: String) =
    delegate.parseTableIdentifier(sqlText)
  override def parseFunctionIdentifier(sqlText: String) =
    delegate.parseFunctionIdentifier(sqlText)
  override def parseMultipartIdentifier(sqlText: String) =
    delegate.parseMultipartIdentifier(sqlText)
  override def parseTableSchema(sqlText: String): StructType =
    delegate.parseTableSchema(sqlText)
  override def parseDataType(sqlText: String): DataType =
    delegate.parseDataType(sqlText)
  override def parseRoutineParam(sqlText: String): StructType =
    delegate.parseRoutineParam(sqlText)
}
