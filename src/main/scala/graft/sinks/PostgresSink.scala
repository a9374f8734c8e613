package graft.sinks

import graft.KgContext
import graft.model.Naming

/** PostgreSQL COPY bulk sink (reference: output/write/relational/
  * _postgresql.py): per-label part CSVs + `{label}-create_table.sql` DDL +
  * a psql import script of CREATE TABLE then `\copy` commands.
  */
class PostgresCsvSink(
    ctx: KgContext,
    outDir: String,
    dbUser: String = "postgres",
    dbPassword: String = "postgres",
    dbHost: String = "localhost",
    dbPort: String = "5432",
) extends BatchSink(ctx, outDir) {

  import BatchSink._

  /** Postgres quoting: plain wrap, no escaping
    * (reference: relational/_postgresql.py:59-64). */
  override def quoteString(value: String): String =
    conf.quote + value + conf.quote

  /** Array cell: `"{a,b}"` (reference: relational/_postgresql.py:66-78). */
  override def arrayString(items: Seq[String]): String =
    "\"{" + items.mkString(",") + "}\""

  override def importScriptName: String = s"${conf.dbName}-import-call.sh"

  /** pascal -> psql table name: dots to underscores, lowercased
    * (reference: _postgresql.py:89-92). */
  protected def psqlName(pascal: String): String =
    pascal.replace(".", "_").toLowerCase

  protected def dataType(t: String): String = t match {
    case "str"                  => "VARCHAR"
    case "int"                  => "INTEGER"
    case "long"                 => "BIGINT"
    case "float" | "double" | "dbl" => "NUMERIC"
    case "boolean" | "bool"     => "BOOLEAN"
    case "str[]" | "string[]"   => "VARCHAR[]"
    case _                      => "VARCHAR"
  }

  /** DDL per label + the \copy command list (reference writes DDL in
    * `_write_node_headers`; same here). */
  override def writeHeaders(): Unit = {
    nodeLayouts.values.foreach { lay =>
      val table = psqlName(lay.fileLabel)
      val cols = Vector("_ID VARCHAR") ++
        lay.propKeys.zip(lay.propTypes).map { case (k, t) => s"${psqlName(k)} ${dataType(t)}" } ++
        Vector("_LABEL VARCHAR[]")
      writeDdl(table, cols, lay)
    }
    edgeLayouts.values.foreach { lay =>
      val table = psqlName(lay.fileLabel)
      val cols = Vector("_START_ID VARCHAR", "_ID VARCHAR") ++
        lay.propKeys.zip(lay.propTypes).map { case (k, t) => s"${psqlName(k)} ${dataType(t)}" } ++
        Vector("_END_ID VARCHAR", "_TYPE VARCHAR")
      writeDdl(table, cols, lay)
    }
  }

  private def writeDdl(table: String, cols: Vector[String], lay: LabelLayout): Unit = {
    val sb = new StringBuilder
    if (conf.wipe) sb ++= s"DROP TABLE IF EXISTS $table;\n"
    sb ++= s"CREATE TABLE $table(${cols.mkString(",")});\n"
    writeDriverFile(outDir, s"$table-create_table.sql", sb.toString)
  }

  protected def copyCommands: Seq[(String, String)] =
    (nodeLayouts.values ++ edgeLayouts.values).toSeq.flatMap { lay =>
      partsOf(lay.fileLabel).map { part =>
        psqlName(lay.fileLabel) -> joinPath(filePrefix, part)
      }
    }

  protected def ddlPaths: Seq[String] =
    (nodeLayouts.values ++ edgeLayouts.values).toSeq
      .map(lay => joinPath(filePrefix, s"${psqlName(lay.fileLabel)}-create_table.sql"))

  override def constructImportCall(): String = {
    val sb = new StringBuilder
    ddlPaths.foreach { p =>
      sb ++= s"""echo "Setup $p..."\n"""
      sb ++= s"PGPASSWORD=$dbPassword ${binPrefix}psql -f $p --dbname ${conf.dbName}"
      sb ++= s" --host $dbHost --port $dbPort --user $dbUser\necho \"Done!\"\n\n"
    }
    copyCommands.foreach { case (table, path) =>
      val cmd = s"\\copy $table FROM '$path' DELIMITER E'${escDelim}' CSV;"
      sb ++= s"""echo "Importing $path..."\n"""
      sb ++= s"""PGPASSWORD=$dbPassword ${binPrefix}psql -c "$cmd" --dbname ${conf.dbName}"""
      sb ++= s" --host $dbHost --port $dbPort --user $dbUser\necho \"Done!\"\n\n"
    }
    sb.toString
  }

  protected def binPrefix: String = conf.importCallBinPrefix.getOrElse("")
  protected def escDelim: String = if (delim == "\t") "\\t" else delim
}

/** SQLite sink: Postgres formats, sqlite3 import script
  * (reference: output/write/relational/_sqlite.py). */
class SqliteCsvSink(ctx: KgContext, outDir: String) extends PostgresCsvSink(ctx, outDir) {

  override def importScriptName: String = s"${conf.dbName}-import-call.sh"

  override def constructImportCall(): String = {
    val sb = new StringBuilder
    ddlPaths.foreach { p =>
      sb ++= s"""echo "Setup $p..."\n"""
      sb ++= s"${binPrefix}sqlite3 ${conf.dbName} < $p\necho \"Done!\"\n\n"
    }
    copyCommands.foreach { case (table, path) =>
      sb ++= s"""echo "Importing $path..."\n"""
      sb ++= s"""${binPrefix}sqlite3 -separator $$'${escDelim}' ${conf.dbName} ".import $path $table""""
      sb ++= "\necho \"Done!\"\n\n"
    }
    sb.toString
  }
}
