package graft.model

import scala.collection.mutable

/**
 * Parser for the reference's Apache-style checklist config grammar
 * (Config::General; grammar observed across the reference fixtures — see
 * FIXTURES.md §1; single-checklist rule at Checklist.pm:92-93):
 *
 * {{{
 * <checklist NAME>
 *   header_row "one,two"
 *   unknown_term "not available"      # repeatable
 *   <dependencies>
 *     <if one> then two
 *              else four </if>
 *     <one_of> group_one one
 *              group_one two </one_of>
 *     <some_of> group_a three </some_of>
 *   </dependencies>
 *   <field>
 *     name one
 *     type Bool|Int|Str|Enum|DateTime|Ontology|Taxonomy
 *     description  free text
 *     required 1
 *     accepts_unknown 1
 *     min 5   max 10                  # Int
 *     validation ^\d+$                # Str
 *     values A                        # Enum, repeatable
 *     path t/data/05_envo.obo         # Ontology / Taxonomy
 *   </field>
 * </checklist>
 * }}}
 *
 * Ontology/Taxonomy `path`s resolve through a pluggable loader so tests can
 * inject literal term sets; the default loads OBO / names.dmp files via
 * [[graft.sources.LookupSources]].
 */
object ChecklistConfig {

  type LookupResolver = (String, String) => FieldType // (type, path) => FieldType

  val fileResolver: LookupResolver = {
    case ("Ontology", path) =>
      FieldType.OntologyT(graft.sources.LookupSources.oboTerms(path), path)
    case ("Taxonomy", path) =>
      val (ids, names) = graft.sources.LookupSources.taxonomyMaps(path)
      FieldType.TaxonomyT(ids.keySet, names.keySet)
    case (t, _) => throw new IllegalArgumentException(s"no lookup for type $t")
  }

  def parseFile(path: String, resolver: LookupResolver = fileResolver): Checklist = {
    require(java.nio.file.Files.exists(java.nio.file.Paths.get(path)),
      s"could not find the specified configuration file ($path)")
    parse(new String(java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(path)),
      java.nio.charset.StandardCharsets.UTF_8), resolver)
  }

  // --- a tiny Config::General-style block parser ---------------------------

  private sealed trait Item
  private final case class KV(key: String, value: String) extends Item
  private final case class Block(name: String, arg: String, items: Seq[Item]) extends Item

  private def lex(text: String): Seq[String] =
    text.split("\n", -1).toSeq
      .map(_.replaceAll("#.*$", "").trim)
      .filter(_.nonEmpty)

  private def parseBlock(lines: Seq[String], pos: Int, endTag: String): (Seq[Item], Int) = {
    val items = mutable.ArrayBuffer.empty[Item]
    var i = pos
    val open = "^<([A-Za-z_]+)(?:\\s+(.*?))?>$".r
    val close = "^</([A-Za-z_]+)>$".r
    while (i < lines.length) {
      lines(i) match {
        case close(tag) =>
          if (tag != endTag)
            throw new IllegalArgumentException(s"mismatched closing tag </$tag>")
          return (items.toSeq, i + 1)
        case open(tag, arg) =>
          val (inner, next) = parseBlock(lines, i + 1, tag)
          items += Block(tag, Option(arg).getOrElse(""), inner)
          i = next
        case kv =>
          val parts = kv.split("\\s+", 2)
          items += KV(parts(0), if (parts.length > 1) unquote(parts(1)) else "")
          i += 1
      }
    }
    if (endTag.nonEmpty)
      throw new IllegalArgumentException(
        s"could not parse config: unclosed block <$endTag>")
    (items.toSeq, i)
  }

  private def unquote(s: String): String = {
    val t = s.trim
    if (t.length >= 2 && t.startsWith("\"") && t.endsWith("\"")) t.substring(1, t.length - 1)
    else t
  }

  def parse(text: String, resolver: LookupResolver = fileResolver): Checklist = {
    val (items, _) = parseBlock(lex(text), 0, "")
    val checklists = items.collect { case b @ Block("checklist", _, _) => b }
    // exactly one checklist per config (reference: Checklist.pm:92-93)
    if (checklists.isEmpty)
      throw new IllegalArgumentException("could not find a valid checklist definition")
    if (checklists.size > 1)
      throw new IllegalArgumentException(
        "found multiple checklists in the configuration; only one is allowed")
    val cl = checklists.head

    val kvs = cl.items.collect { case kv: KV => kv }
    val headerRow = kvs.find(_.key == "header_row").map(_.value)
    val unknownTerms = kvs.filter(_.key == "unknown_term").map(_.value)

    val fields = cl.items.collect { case Block("field", _, fi) =>
      val m = fi.collect { case KV(k, v) => (k, v) }
      def one(k: String): Option[String] = m.find(_._1 == k).map(_._2)
      def all(k: String): Seq[String] = m.filter(_._1 == k).map(_._2)
      val name = one("name").getOrElse(
        throw new IllegalArgumentException("field without a name"))
      val tname = one("type").getOrElse(
        throw new IllegalArgumentException(s"field '$name' without a type"))
      val ftype = tname match {
        case "Bool" => FieldType.BoolT
        case "Int" => FieldType.IntT(one("min").map(_.toLong), one("max").map(_.toLong))
        case "Str" => FieldType.StrT(one("validation"))
        case "Enum" => FieldType.EnumT(all("values"))
        case "DateTime" => FieldType.DateTimeT
        case "Ontology" | "Taxonomy" =>
          val path = one("path").getOrElse(throw new IllegalArgumentException(
            s"the $tname validator requires a file path ('$name' field)"))
          resolver(tname, path)
        case other =>
          // reference: NoValidatorPluginForColumnType (Validator.pm:249-255)
          throw new IllegalArgumentException(
            s"There is no validation plugin for this column type ($other)")
      }
      // Perl-truthiness for flag values ("1" in every reference fixture,
      // but any non-empty non-"0" value is truthy to Config::General users)
      def truthy(k: String): Boolean =
        one(k).exists(v => v.nonEmpty && v != "0")
      FieldDef(name, ftype,
        description = one("description"),
        required = truthy("required"),
        acceptsUnknown = truthy("accepts_unknown"),
        unknownFlag = truthy("unknown"))
    }

    val deps = cl.items.collectFirst { case Block("dependencies", _, di) =>
      val ifs = di.collect { case Block("if", guard, ii) =>
        val m = ii.collect { case KV(k, v) => (k, v) }
        IfDep(guard.trim,
          thens = m.filter(_._1 == "then").map(_._2),
          elses = m.filter(_._1 == "else").map(_._2))
      }
      def groups(tag: String): Seq[GroupDep] = di.collect {
        case Block(`tag`, _, gi) =>
          gi.collect { case KV(g, f) => (g, f) }
            .groupBy(_._1).toSeq.sortBy(_._1)
            .map { case (g, fs) => GroupDep(g, fs.map(_._2)) }
      }.flatten
      Dependencies(ifs, groups("one_of"), groups("some_of"))
    }.getOrElse(Dependencies())

    Checklist(cl.arg.trim, fields, deps, unknownTerms, headerRow)
  }
}
