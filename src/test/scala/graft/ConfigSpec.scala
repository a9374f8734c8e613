package graft

import org.scalatest.funsuite.AnyFunSuite

/** Mirrors the reference's layered module config
  * (biocypher/_config/__init__.py:22-95): default<-user<-local merge
  * semantics, the double-quoted-escape warning, delimiter processing. */
class ConfigSpec extends AnyFunSuite {

  test("defaults alone resolve to the reference's neo4j settings") {
    val l = KgConfigLoader.load(None, None)
    assert(l.dbms == "neo4j")
    assert(l.offline)
    assert(l.config.delimiter == ";")
    assert(l.config.arrayDelimiter == "|")
    assert(l.config.quote == "'")
    assert(l.config.labelsOrder == "Ascending")
    assert(l.config.dbName == "neo4j")
    assert(l.config.wipe)
    assert(!l.config.strictMode)
    assert(l.warnings.isEmpty)
  }

  test("local layer overrides defaults per top-level key (shallow dict update)") {
    val local =
      """biocypher:
        |  strict_mode: true
        |neo4j:
        |  delimiter: ','
        |  skip_duplicate_nodes: true
        |""".stripMargin
    val l = KgConfigLoader.load(Some(local))
    assert(l.config.delimiter == ",")
    assert(l.config.skipDuplicateNodes)
    assert(l.config.strictMode)
    // untouched sibling keys inside the updated sections survive the merge
    assert(l.config.quote == "'")
    assert(l.config.dbName == "neo4j")
  }

  test("local wins over user; user wins over defaults (read_config precedence)") {
    val user = "neo4j:\n  delimiter: ','\n  database_name: userdb\n"
    val local = "neo4j:\n  delimiter: '@'\n"
    val l = KgConfigLoader.load(Some(local), Some(user))
    // NOTE reference semantics: the merge picks ONE layer per top-level key
    // (local if present, else user) — local's neo4j section shadows user's
    // entirely, so database_name falls back to the module default
    assert(l.config.delimiter == "@")
    assert(l.config.dbName == "neo4j")
  }

  test("keys unknown to the module defaults are dropped (read_config loop)") {
    val l = KgConfigLoader.load(Some("not_a_section:\n  x: 1\n"))
    assert(!l.merged.contains("not_a_section"))
  }

  test("dbms selection pulls that section (postgresql: tab delimiter, double quote)") {
    val l = KgConfigLoader.load(Some("biocypher:\n  dbms: postgres\n"))
    assert(l.dbms == "postgres")
    assert(l.config.delimiter == "\t", "single-quoted '\\t' goes through _process_delimiter")
    assert(l.config.quote == "\"")
    assert(l.config.dbName == "postgres")
  }

  test("double-quoted scalar with an escape sequence warns (MyLoader parity)") {
    val l = KgConfigLoader.load(Some("neo4j:\n  delimiter: \"\\t\"\n"))
    assert(l.warnings.nonEmpty)
    assert(l.warnings.head.contains("Double quotes detected"))
    // the value still loads (warning, not error), and is processed to a tab
    assert(l.config.delimiter == "\t")
  }

  test("fromConfig wires dbms + settings into a live session") {
    val spark = SparkTestBase.spark
    val dir = java.nio.file.Files.createTempDirectory("graft-cfg-").toString
    val s = KgSession.fromConfig(
      spark,
      TestFixtures.resource("test_schema.yaml"),
      TestFixtures.resource("biolink_mini.ttl"),
      "entity",
      dir,
      localConfigYaml = Some("biocypher:\n  dbms: csv\ncsv:\n  delimiter: ';'\n"))
    assert(s.sink.isInstanceOf[graft.sinks.PandasCsvSink])
    assert(s.ctx.config.delimiter == ";")
    assert(s.configWarnings.isEmpty)
  }
}
