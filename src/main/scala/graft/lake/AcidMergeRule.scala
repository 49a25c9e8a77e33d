package graft.lake

import org.apache.spark.sql.{Row, SparkSession}
import org.apache.spark.sql.catalyst.analysis.UnresolvedAttribute
import org.apache.spark.sql.catalyst.expressions.{Attribute, EqualTo, Expression, NamedExpression}
import org.apache.spark.sql.catalyst.plans.logical.{Assignment, DeleteAction, InsertAction, LogicalPlan, MergeIntoTable, SubqueryAlias, UpdateAction, UpdateTable}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.command.LeafRunnableCommand
import org.apache.spark.sql.execution.datasources.v2.DataSourceV2Relation
import org.apache.spark.sql.graft.PlanShim

/** Session-extension resolution rule: `MERGE INTO <graft catalog table>`
  * becomes [[AcidMergeCommand]] BEFORE Spark's row-level-operation rewrite
  * can reject the table (the pre-DSv2 Delta architecture). The reference's
  * one MERGE shape (`TransactionWriter.java:154-161`) — PK-equality
  * condition, matched UPDATE SET, not-matched full-row INSERT — maps to
  * [[AcidTable.merge]]; other shapes fail loudly.
  *
  * Injected via [[org.apache.spark.sql.graft.GraftExtensions]]; fires only
  * once the target has resolved to an [[AcidV2Table]] relation, so it never
  * touches MERGE statements aimed at other sources.
  */
case class AcidMergeRule(spark: SparkSession) extends Rule[LogicalPlan] {

  override def apply(plan: LogicalPlan): LogicalPlan = plan.resolveOperatorsDown {
    case m: MergeIntoTable =>
      acidTarget(m.targetTable) match {
        case None => m
        case Some(acid) =>
          require(keyEquality(m.mergeCondition, acid.pkCol),
            s"MERGE condition must be t.${acid.pkCol} = s.${acid.pkCol}," +
              s" got: ${m.mergeCondition.sql}")
          val targetAliases = aliasNames(m.targetTable)
          val check = requireIdentityAssignment(targetAliases) _
          def isIdentity(a: Assignment): Boolean =
            scala.util.Try { check(a); true }.getOrElse(false)
          def requireFullInsert(assigns: Seq[Assignment]): Unit = {
            val cols = assigns.map(assignedCol).toSet
            require(acid.schema.fieldNames.forall(cols.contains),
              s"MERGE insert must cover the full schema" +
                s" ${acid.schema.fieldNames.mkString(",")}, got $cols")
          }
          (m.matchedActions, m.notMatchedActions, m.notMatchedBySourceActions) match {
            case (Seq(DeleteAction(None)), Seq(), Seq()) =>
              // MERGE … WHEN MATCHED THEN DELETE (round 9): delete by the
              // source's key set — the bucket-pruned key path, not a rewrite
              AcidMergeDeleteCommand(acid, m.sourceTable)
            case (Seq(UpdateAction(None, assigns, _)), Seq(InsertAction(None, ins)), Seq())
                if assigns.forall(isIdentity) && ins.forall(isIdentity) =>
              // the unconditional IDENTITY shape keeps the fast
              // window-merge formulation (and its driver kernel);
              // transformed SET values route through the expression-clause
              // path below (round 10b)
              requireFullInsert(ins)
              AcidMergeCommand(acid, m.sourceTable, assigns.map(assignedCol))
            case (matchedActions, notMatchedActions, nmbsActions) =>
              // conditional / multi-clause MERGE (round 10): clause
              // conditions are re-qualified onto the canonical t/s
              // aliases and carried as SQL text across the command
              // boundary (the AcidUpdateCommand convention) — they
              // re-resolve at run time against mergeConditional's joined
              // pair, so the command stays a plain serializable value
              val sql = requalifiedSql(m, targetAliases) _
              val matched = matchedActions.map {
                case UpdateAction(c, assigns, _) if assigns.forall(isIdentity) =>
                  AcidMergeConditionalCommand.Clause(
                    c.map(sql), Some(assigns.map(assignedCol)))
                case UpdateAction(c, assigns, _) =>
                  // round 10b: arbitrary SET expressions over the t/s
                  // pre-image — re-qualified and carried as SQL text like
                  // clause conditions
                  AcidMergeConditionalCommand.Clause(
                    c.map(sql), None,
                    Some(assigns.map(a => assignedCol(a) -> sql(a.value))))
                case DeleteAction(c) =>
                  AcidMergeConditionalCommand.Clause(c.map(sql), None)
                case other => throw new IllegalArgumentException(
                  s"unsupported WHEN MATCHED action: $other")
              }
              val notMatched = notMatchedActions.map {
                case InsertAction(c, assigns) if assigns.forall(isIdentity) =>
                  requireFullInsert(assigns)
                  AcidMergeConditionalCommand.Insert(c.map(sql), None)
                case InsertAction(c, assigns) =>
                  // round 10b: reordered / transformed / partial VALUES —
                  // per-column expressions over the source, carried as
                  // re-qualified SQL (validated in mergeClauses)
                  AcidMergeConditionalCommand.Insert(c.map(sql),
                    Some(assigns.map(a => assignedCol(a) -> sql(a.value))))
                case other => throw new IllegalArgumentException(
                  s"unsupported WHEN NOT MATCHED action: $other")
              }
              // round 10: full-sync deletes of target rows absent from the
              // source; round 10b adds expression UPDATE clauses (t-only
              // references, validated in mergeConditional)
              val nmbs = nmbsActions.map {
                case DeleteAction(c) =>
                  AcidMergeConditionalCommand.Clause(c.map(sql), None)
                case UpdateAction(c, assigns, _) =>
                  AcidMergeConditionalCommand.Clause(c.map(sql), None,
                    Some(assigns.map(a => assignedCol(a) -> sql(a.value))))
                case other => throw new IllegalArgumentException(
                  s"unsupported WHEN NOT MATCHED BY SOURCE action: $other")
              }
              AcidMergeConditionalCommand(acid, m.sourceTable, matched, notMatched, nmbs)
          }
      }

    case u: UpdateTable =>
      acidTarget(u.table) match {
        case None => u
        case Some(acid) =>
          // UPDATE = snapshot → filter → apply SET → transactional upsert
          // (keys unchanged, so the upsert IS the row update). Assignments
          // and condition are carried as SQL text — with attribute
          // qualifiers stripped so they re-resolve against the snapshot —
          // and evaluated at run time.
          val sets = u.assignments.map(a => assignedCol(a) -> bareNames(a.value).sql)
          require(!sets.exists(_._1.equalsIgnoreCase(acid.pkCol)),
            s"UPDATE may not SET the primary key ${acid.pkCol}")
          AcidUpdateCommand(acid, sets, u.condition.map(c => bareNames(c).sql))
      }
  }

  private def acidTarget(p: LogicalPlan): Option[AcidTable] = p match {
    case SubqueryAlias(_, child) => acidTarget(child)
    case r: DataSourceV2Relation => r.table match {
      case t: AcidV2Table => Some(t.acid)
      case _ => None
    }
    case _ => None
  }

  /** Strip table/catalog qualifiers so a rendered expression re-resolves
    * against the bare snapshot DataFrame columns. */
  private def bareNames(e: Expression): Expression = e.transform {
    case a: UnresolvedAttribute => UnresolvedAttribute(Seq(a.nameParts.last))
    case a: Attribute => UnresolvedAttribute(Seq(a.name))
  }

  private def colName(e: Expression): String = e match {
    case a: UnresolvedAttribute => a.nameParts.last
    case a: Attribute => a.name
    case n: NamedExpression => n.name
    case other =>
      throw new IllegalArgumentException(s"expected a column reference, got: ${other.sql}")
  }

  private def assignedCol(a: Assignment): String = colName(a.key)

  /** Alias names under which a plan's columns can be qualified: every
    * `SubqueryAlias` on the chain plus the catalog table's own name.
    * Lower-cased — MERGE qualifiers resolve case-insensitively.
    */
  private def aliasNames(p: LogicalPlan): Set[String] = p match {
    case SubqueryAlias(id, child) => aliasNames(child) + id.name.toLowerCase
    case r: DataSourceV2Relation => r.table match {
      case t: AcidV2Table => Set(t.name().toLowerCase)
      case _ => Set.empty
    }
    case _ => Set.empty
  }

  /** [[AcidTable.merge]] copies same-named source columns — it can only
    * execute assignments of the shape `t.c = s.c`. Any transformed or
    * reordered VALUE expression (`t.v = s.v * 2`, `t.a = s.b`) would
    * silently run as the identity mapping, so reject it here instead.
    * The NAME alone is not enough: `t.v = t.v` ("keep the target value")
    * names the same column but qualifies it with the TARGET — executing
    * it as a copy from `s.v` is exactly the silent-wrong-data class this
    * check exists to reject, so any value qualified by a target alias is
    * rejected too (an unqualified value is accepted as the source column,
    * the reference's only shape).
    */
  private def requireIdentityAssignment(targetAliases: Set[String])(a: Assignment): Unit = {
    val key = assignedCol(a)
    def qualifierIsNotTarget(qualifier: Seq[String]): Boolean =
      qualifier.lastOption.forall(q => !targetAliases.contains(q.toLowerCase))
    val ok = a.value match {
      case attr: UnresolvedAttribute =>
        attr.nameParts.last == key && qualifierIsNotTarget(attr.nameParts.init)
      case attr: Attribute =>
        attr.name == key && qualifierIsNotTarget(attr.qualifier)
      case _ => false
    }
    require(ok,
      s"MERGE assignment for '$key' must be the same-named SOURCE column" +
        s" (t.$key = s.$key); transformed or target-qualified values are" +
        s" not supported, got: ${a.value.sql}")
  }

  private def keyEquality(cond: Expression, pk: String): Boolean = cond match {
    case EqualTo(l, r) => colName(l) == pk && colName(r) == pk
    case _ => false
  }

  /** A clause condition rendered as SQL with its column references
    * re-qualified onto the canonical `t`/`s` aliases. Resolved attributes
    * classify by the MERGE node's own output sets; unresolved ones by the
    * statement's alias names. Bare unresolved names fail loudly — target
    * and source share the schema, so they are ambiguous by construction.
    */
  private def requalifiedSql(m: MergeIntoTable, targetAliases: Set[String])(
      e: Expression): String = {
    val tOut = m.targetTable.outputSet
    val sOut = m.sourceTable.outputSet
    val sourceAliases = subAliases(m.sourceTable)
    e.transform {
      case a: Attribute if tOut.contains(a) => UnresolvedAttribute(Seq("t", a.name))
      case a: Attribute if sOut.contains(a) => UnresolvedAttribute(Seq("s", a.name))
      case a: UnresolvedAttribute if a.nameParts.size > 1 =>
        val q = a.nameParts.init.last.toLowerCase
        if (targetAliases.contains(q)) UnresolvedAttribute(Seq("t", a.nameParts.last))
        else if (sourceAliases.contains(q)) UnresolvedAttribute(Seq("s", a.nameParts.last))
        else throw new IllegalArgumentException(
          s"unknown qualifier '$q' in MERGE clause condition: ${a.sql}")
      case a: UnresolvedAttribute => throw new IllegalArgumentException(
        "MERGE clause conditions must qualify column references with the " +
          s"target or source alias, got bare: ${a.sql}")
    }.sql
  }

  private def subAliases(p: LogicalPlan): Set[String] = p match {
    case SubqueryAlias(id, child) => subAliases(child) + id.name.toLowerCase
    case _ => Set.empty
  }
}

/** Driver-orchestrated MERGE: the source plan re-analyzes through the
  * session (temp views resolve as in `spark.sql`) and flows into the
  * transactional [[AcidTable.merge]] — metadata and commit logic on the
  * driver, all row movement in distributed Spark jobs.
  */
case class AcidMergeCommand(
    acid: AcidTable,
    source: LogicalPlan,
    updateCols: Seq[String]) extends LeafRunnableCommand {

  override def run(session: SparkSession): Seq[Row] = {
    acid.merge(PlanShim.ofRows(session, source), updateCols)
    Seq.empty
  }
}

/** `MERGE … WHEN MATCHED THEN DELETE` — the source's key set IS the
  * delete set; routed through the same anti-join/key-set delete every
  * other front-end uses. */
case class AcidMergeDeleteCommand(
    acid: AcidTable,
    source: LogicalPlan) extends LeafRunnableCommand {

  override def run(session: SparkSession): Seq[Row] = {
    acid.delete(PlanShim.ofRows(session, source))
    Seq.empty
  }
}

/** Conditional / multi-clause MERGE through the catalog front-end:
  * clause conditions travel as re-qualified SQL text and re-resolve at
  * run time against [[AcidTable.mergeConditional]]'s `t`/`s` pair join.
  */
case class AcidMergeConditionalCommand(
    acid: AcidTable,
    source: LogicalPlan,
    matched: Seq[AcidMergeConditionalCommand.Clause],
    notMatched: Seq[AcidMergeConditionalCommand.Insert],
    notMatchedBySource: Seq[AcidMergeConditionalCommand.Clause] = Nil)
    extends LeafRunnableCommand {

  override def run(session: SparkSession): Seq[Row] = {
    import org.apache.spark.sql.functions.expr
    def toClause(c: AcidMergeConditionalCommand.Clause): MergeMatchedClause = c match {
      case AcidMergeConditionalCommand.Clause(cond, Some(cols), _) =>
        MergeMatchedClause.Update(cond.map(expr), cols)
      case AcidMergeConditionalCommand.Clause(cond, None, Some(assigns)) =>
        MergeMatchedClause.UpdateExprs(cond.map(expr),
          assigns.map { case (col, e) => col -> expr(e) })
      case AcidMergeConditionalCommand.Clause(cond, None, None) =>
        MergeMatchedClause.Delete(cond.map(expr))
    }
    acid.mergeClauses(
      PlanShim.ofRows(session, source),
      matched.map(toClause),
      notMatched.map(i => MergeInsertClause(i.conditionSql.map(expr),
        i.assignSql.map(_.map { case (c, e) => c -> expr(e) }))),
      notMatchedBySource = notMatchedBySource.map(toClause))
    Seq.empty
  }
}

object AcidMergeConditionalCommand {
  /** `updateCols` Some = identity UPDATE SET of those columns;
    * `assignSql` Some = expression UPDATE SET (re-qualified SQL per
    * column, round 10b); both None = DELETE. */
  final case class Clause(
      conditionSql: Option[String],
      updateCols: Option[Seq[String]],
      assignSql: Option[Seq[(String, String)]] = None)
  /** `assignSql` None = identity full-row insert; Some = per-column
    * expression VALUES (round 10b). */
  final case class Insert(
      conditionSql: Option[String],
      assignSql: Option[Seq[(String, String)]])
}

/** Driver-orchestrated UPDATE, routed through [[AcidTable.update]] — the
  * group-based row-level rewrite whose matched set is rediscovered inside
  * the OCC commit loop. (The earlier snapshot→filter→SET→upsert
  * translation here read the snapshot BEFORE the upsert's commit loop: a
  * conflicting commit between read and publish retried the upsert with
  * values computed from the stale read — a lost update. `AcidTable.update`
  * re-runs the whole rewrite against the fresh snapshot on conflict.)
  *
  * All SET expressions are evaluated in ONE projection against the
  * original snapshot row (SQL UPDATE semantics): `SET a = b, b = a`
  * swaps, because neither RHS observes the other assignment's result.
  * Column resolution (case-insensitivity, duplicate rejection) lives in
  * [[AcidTable.update]] so the text and catalog front-ends cannot drift.
  */
case class AcidUpdateCommand(
    acid: AcidTable,
    sets: Seq[(String, String)],
    conditionSql: Option[String]) extends LeafRunnableCommand {

  override def run(session: SparkSession): Seq[Row] = {
    import org.apache.spark.sql.functions.{expr, lit}
    acid.update(sets.map { case (c, e) => c -> expr(e) },
      conditionSql.map(expr).getOrElse(lit(true)))
    Seq.empty
  }
}
