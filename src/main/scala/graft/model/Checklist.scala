package graft.model

/**
 * The checklist data model: a declarative schema + constraint catalog that is
 * compiled to Catalyst predicate columns (see [[graft.compile.ChecklistCompiler]]).
 *
 * Semantics derive from the reference validator's checklist config
 * (reference: lib/Bio/Metadata/Checklist.pm:79-98 — ordered field defs,
 * optional dependencies block, header_row, unknown_term list), re-expressed
 * as an immutable Scala ADT. Cells are untyped strings at rest; "types" are
 * validators applied to strings (reference: lib/Bio/Metadata/Validator.pm:91-94
 * registers Str Int Enum DateTime Ontology Bool Taxonomy).
 */
sealed trait FieldType {
  /** Plugin name as the reference spells it; used in verbose error fallback
   * (reference: lib/Bio/Metadata/Validator.pm:264). */
  def typeName: String
}

object FieldType {

  /** Boolean-ish strings, case-insensitive (reference: Plugin/Bool.pm:12-16). */
  case object BoolT extends FieldType { val typeName = "Bool" }

  /** Optionally-signed integer literal with optional inclusive bounds
   * (reference: Plugin/Int.pm:14-27; bounds at 23-24). */
  final case class IntT(min: Option[Long] = None, max: Option[Long] = None)
      extends FieldType { val typeName = "Int" }

  /** Non-empty, non-whitespace string; optional unanchored regex — substring
   * match, like Perl m// (reference: Plugin/Str.pm:14-28). */
  final case class StrT(pattern: Option[String] = None) extends FieldType {
    val typeName = "Str"
  }

  /** Exact, case-sensitive membership in a literal value list
   * (reference: Plugin/Enum.pm:12-18). */
  final case class EnumT(values: Seq[String]) extends FieldType {
    val typeName = "Enum"
  }

  /** ISO-8601 date/time; the two-digit-year form ^\d{2}-\d{2}-\d{2}$ is
   * explicitly rejected (reference: Plugin/DateTime.pm:15-33, reject at 23). */
  case object DateTimeT extends FieldType { val typeName = "DateTime" }

  /**
   * Membership in a term set loaded from an external source (OBO ontology
   * id: terms — reference: Plugin/Ontology.pm:39-53). At cluster scale the
   * set ships as a broadcast lookup set, the reference's own design insight
   * (its in-memory hash beat a per-value file scan 4.5x,
   * Plugin/Ontology.pm:63-69).
   */
  final case class OntologyT(terms: Set[String], sourceId: String = "")
      extends FieldType { val typeName = "Ontology" }

  /** Membership in either of two sets: taxonomy IDs or scientific names —
   * either-or, id↔name consistency deliberately unchecked
   * (reference: Plugin/Taxonomy.pm:22-38, either-or at 36). */
  final case class TaxonomyT(ids: Set[String], names: Set[String])
      extends FieldType { val typeName = "Taxonomy" }
}

/**
 * One field (column) definition. `required`/`acceptsUnknown` default off as
 * in the reference fixtures (FIXTURES.md §1). `description` feeds verbose
 * error messages (reference: Validator.pm:262-270). `unknownFlag` models
 * the reference's field-def `unknown` key — distinct from
 * `accepts_unknown` — whose only effect is suppressing the required-field
 * error on empty cells (reference: Validator.pm:238-245).
 */
final case class FieldDef(
    name: String,
    ftype: FieldType,
    description: Option[String] = None,
    required: Boolean = false,
    acceptsUnknown: Boolean = false,
    unknownFlag: Boolean = false
)

/** `if <guard> { then...; else... }` rule. Guard must be declared Bool —
 * checked at compile time (reference defers to first row,
 * Validator.pm:426-433; we fail fast on the driver). */
final case class IfDep(guard: String, thens: Seq[String], elses: Seq[String])

/** A named one_of / some_of group (reference: Validator.pm:302-327). */
final case class GroupDep(name: String, fields: Seq[String])

final case class Dependencies(
    ifs: Seq[IfDep] = Nil,
    oneOf: Seq[GroupDep] = Nil,
    someOf: Seq[GroupDep] = Nil
) {
  def isEmpty: Boolean = ifs.isEmpty && oneOf.isEmpty && someOf.isEmpty
}

/**
 * A complete checklist. Field order is load-bearing: violations are emitted
 * in field order, then if / one_of / some_of order (reference:
 * Validator.pm:219-279, 297-331).
 */
final case class Checklist(
    name: String,
    fields: Seq[FieldDef],
    dependencies: Dependencies = Dependencies(),
    unknownTerms: Seq[String] = Nil,
    headerRow: Option[String] = None
) {
  def fieldNames: Seq[String] = fields.map(_.name)
  lazy val fieldByName: Map[String, FieldDef] =
    fields.map(f => f.name -> f).toMap

  /** Driver-side config validation — the compile-time analogue of the
   * reference's lazily-raised BadConfig checks (Validator.pm:426-433). */
  def validateConfig(): Either[String, Checklist] = {
    val dup = fieldNames.diff(fieldNames.distinct).distinct
    if (dup.nonEmpty) return Left(s"duplicate field names: ${dup.mkString(", ")}")
    val depFields =
      dependencies.ifs.flatMap(d => d.guard +: (d.thens ++ d.elses)) ++
        dependencies.oneOf.flatMap(_.fields) ++
        dependencies.someOf.flatMap(_.fields)
    depFields.find(!fieldByName.contains(_)) match {
      case Some(missing) =>
        return Left(
          s"can't find field definition for '$missing' (required by a dependency)")
      case None =>
    }
    dependencies.ifs.find(d => fieldByName(d.guard).ftype != FieldType.BoolT) match {
      case Some(bad) =>
        return Left(
          s"fields with an 'if' dependency must have type Bool ('${bad.guard}' field)")
      case None =>
    }
    Right(this)
  }
}

/** Tri-state per-field validation verdict (reference:
 * Validator/PluginRole.pm:33-39 returns -1 for accepted unknown;
 * plugins return 1 valid / 0 invalid). SKIPPED covers empty cells, which
 * bypass type validation entirely (Validator.pm:238-245). */
object FieldState {
  val Invalid: Byte = 0
  val Valid: Byte = 1
  val Unknown: Byte = -1 // value is an accepted "unknown" term
  val Skipped: Byte = 2 // empty/whitespace-only cell: no type check applies
}

/** Stable rule identifiers for the structured violation output
 * (north_star: violation rows are (row_id, field, rule_id, message)). */
object RuleIds {
  val Required = "required"
  val FieldInvalid = "field_invalid"
  val IfGuardInvalid = "if_guard_invalid"
  val IfThenInvalid = "if_then_invalid"
  val IfThenPresent = "if_then_present"
  val IfElseInvalid = "if_else_invalid"
  val IfElsePresent = "if_else_present"
  val OneOf = "one_of"
  val SomeOf = "some_of"
  // engine extensions (no reference counterpart)
  val Unique = "unique_key"
  val Referential = "referential"
  val Drift = "distribution_drift"
}
