package graft

import scala.collection.immutable.ListMap
import graft.schema.{Y, YB, YL, YM, YS, YamlLite}

/** Layered config-file loading — the Spark-native mirror of the reference's
  * module config (reference: biocypher/_config/__init__.py:70-95 and
  * _config/biocypher_config.yaml): module defaults <- user-level conf <-
  * working-directory conf, merged per TOP-LEVEL key (scalar defaults are
  * replaced, map defaults are shallow-updated), with keys unknown to the
  * defaults ignored — exactly `read_config()`'s loop. Also mirrors the
  * MyLoader warning (reference: _config/__init__.py:22-40): a double-quoted
  * scalar containing an escape sequence (e.g. delimiter: "\t") is flagged,
  * because escape expansion breaks Neo4j admin-import files; use single
  * quotes. Delimiter scalars go through the reference's `_process_delimiter`
  * (output/write/_batch_writer.py:279-287): the two-character literal `\t`
  * becomes a real tab.
  */
object KgConfigLoader {

  /** What a merged config resolves to for session construction. */
  final case class LoadedConfig(
      dbms: String,
      offline: Boolean,
      config: KgConfig,
      merged: ListMap[String, Y],
      warnings: List[String],
  )

  /** Module defaults: the subset of the reference's
    * `_config/biocypher_config.yaml` this engine consumes (connection
    * credentials and logging knobs are out of scope — no DBMS/egress in the
    * engine; see SURVEY §2.2 O19/O20). */
  val moduleDefaultsYaml: String =
    """biocypher:
      |  dbms: neo4j
      |  offline: true
      |  strict_mode: false
      |neo4j:
      |  database_name: neo4j
      |  wipe: true
      |  delimiter: ';'
      |  array_delimiter: '|'
      |  quote_character: "'"
      |  labels_order: Ascending
      |  skip_duplicate_nodes: false
      |  skip_bad_relationships: false
      |postgresql:
      |  database_name: postgres
      |  quote_character: '"'
      |  delimiter: '\t'
      |sqlite:
      |  database_name: sqlite.db
      |  quote_character: '"'
      |  delimiter: '\t'
      |rdf:
      |  rdf_format: turtle
      |csv:
      |  delimiter: ','
      |networkx:
      |  some_config: some_value
      |""".stripMargin

  /** The MyLoader double-quote check, applied to the raw text (the lite
    * parser strips quote style before values reach us): any `"..."` scalar
    * containing a backslash escape gets the reference's warning. */
  def doubleQuoteWarnings(text: String): List[String] = {
    val re = "\"([^\"]*\\\\[^\"]*)\"".r
    re.findAllMatchIn(text).map { m =>
      s"Double quotes detected in YAML configuration scalar: ${m.group(1)}. " +
        "These allow escape sequences and may cause problems, for instance " +
        "with the Neo4j admin import files (e.g. '\\t'). Make sure you " +
        "wanted to do this, and use single quotes whenever possible."
    }.toList
  }

  /** reference `_process_delimiter`: literal backslash-t -> tab. */
  def processDelimiter(d: String): String = if (d == "\\t") "\t" else d

  /** reference `read_config()`: merge later layers over the defaults, per
    * top-level key; scalar-valued default keys are replaced, map-valued
    * ones shallow-updated; keys absent from the defaults are dropped. */
  def readConfig(userYaml: Option[String], localYaml: Option[String])
      : (ListMap[String, Y], List[String]) = {
    val defaults = YamlLite.parse(moduleDefaultsYaml)
    val user = userYaml.map(YamlLite.parse).getOrElse(ListMap.empty)
    val local = localYaml.map(YamlLite.parse).getOrElse(ListMap.empty)
    val warnings = userYaml.toList.flatMap(doubleQuoteWarnings) ++
      localYaml.toList.flatMap(doubleQuoteWarnings)
    val merged = defaults.map { case (key, dv) =>
      val override_ = local.get(key).orElse(user.get(key))
      val value = (dv, override_) match {
        case (_, None)              => dv
        case (YM(dm), Some(YM(om))) => YM(dm ++ om) // dict.update: shallow
        case (YM(_), Some(other))   => other        // degenerate but mirrored
        case (_, Some(other))       => other        // first-level scalar
      }
      key -> value
    }
    (merged, warnings)
  }

  private def section(merged: ListMap[String, Y], name: String): ListMap[String, Y] =
    merged.get(name) match {
      case Some(YM(m)) => m
      case _           => ListMap.empty
    }

  private def str(m: ListMap[String, Y], k: String): Option[String] =
    m.get(k).collect { case YS(s) => s; case YB(b) => if (b) "true" else "false" }

  private def bool(m: ListMap[String, Y], k: String, dflt: Boolean): Boolean =
    m.get(k) match {
      case Some(YB(b)) => b
      case Some(YS(s)) => s.equalsIgnoreCase("true")
      case _           => dflt
    }

  /** Resolve the merged tree into the engine's [[KgConfig]] for the
    * configured dbms (the reference hands each writer its own section). */
  def load(localYaml: Option[String], userYaml: Option[String] = None): LoadedConfig = {
    val (merged, warnings) = readConfig(userYaml, localYaml)
    val core = section(merged, "biocypher")
    val dbms = str(core, "dbms").getOrElse("neo4j")
    // the reference section names: postgresql -> our "postgres" sink key
    val sectName = dbms match {
      case "postgres" => "postgresql"
      case other      => other
    }
    val s = section(merged, sectName)
    val base = KgConfig()
    val config = base.copy(
      delimiter = str(s, "delimiter").map(processDelimiter).getOrElse(base.delimiter),
      arrayDelimiter = str(s, "array_delimiter").map(processDelimiter)
        .getOrElse(base.arrayDelimiter),
      quote = str(s, "quote_character").getOrElse(base.quote),
      labelsOrder = str(s, "labels_order").getOrElse(base.labelsOrder),
      strictMode = bool(core, "strict_mode", base.strictMode),
      dbName = str(s, "database_name").getOrElse(base.dbName),
      wipe = bool(s, "wipe", base.wipe),
      skipBadRelationships = bool(s, "skip_bad_relationships", base.skipBadRelationships),
      skipDuplicateNodes = bool(s, "skip_duplicate_nodes", base.skipDuplicateNodes),
      importCallBinPrefix = str(s, "import_call_bin_prefix"),
      importCallFilePrefix = str(s, "import_call_file_prefix"),
    )
    val sinkDbms = if (dbms == "postgresql") "postgres" else dbms
    LoadedConfig(sinkDbms, bool(core, "offline", dflt = true), config, merged, warnings)
  }
}
