package graft.sinks

import graft.KgContext
import graft.model.Naming

/** Neo4j admin-import bulk sink (reference: output/write/graph/_neo4j.py):
  * per-label `{Pascal}-partNNN.csv` + `{Pascal}-header.csv` + a v4/v5 dual
  * import script.
  */
class Neo4jCsvSink(ctx: KgContext, outDir: String) extends BatchSink(ctx, outDir) {

  import BatchSink._

  /** Quote with quote-doubling escape (reference: graph/_neo4j.py:47-52). */
  override def quoteString(value: String): String =
    conf.quote + value.replace(conf.quote, conf.quote * 2) + conf.quote

  /** Array string: adelim-join then quote (reference: graph/_neo4j.py:54-68). */
  override def arrayString(items: Seq[String]): String =
    quoteString(items.mkString(conf.arrayDelimiter))

  /** Neo4j sanitizes file labels (reference: _batch_writer.py:925-930). */
  override def fileLabel(label: String): String =
    Naming.nameSentenceToPascal(Naming.parseLabel(label))

  override def importScriptName: String = "neo4j-admin-import-call.sh"

  protected def headerProps(lay: LabelLayout): Vector[String] =
    lay.propKeys.zip(lay.propTypes).map { case (k, t) => k + headerTypeSuffix(t) }

  override def writeHeaders(): Unit = {
    nodeLayouts.values.foreach { lay =>
      val cols = Vector(":ID") ++ headerProps(lay) ++ Vector(":LABEL")
      writeDriverFile(outDir, s"${lay.fileLabel}-header.csv", cols.mkString(delim))
    }
    edgeLayouts.values.foreach { lay =>
      val cols = Vector(":START_ID") ++
        (if (lay.skipId) Vector.empty else Vector("id")) ++
        headerProps(lay) ++ Vector(":END_ID", ":TYPE")
      writeDriverFile(outDir, s"${lay.fileLabel}-header.csv", cols.mkString(delim))
    }
  }

  /** (fileLabel, headerString) rows — the header grammar as data (used by
    * the correctness harness). */
  def headerRows(): Seq[(String, String)] = {
    val nodeRows = nodeLayouts.values.map { lay =>
      lay.fileLabel -> (Vector(":ID") ++ headerProps(lay) ++ Vector(":LABEL")).mkString(delim)
    }
    val edgeRows = edgeLayouts.values.map { lay =>
      lay.fileLabel -> (Vector(":START_ID") ++
        (if (lay.skipId) Vector.empty else Vector("id")) ++
        headerProps(lay) ++ Vector(":END_ID", ":TYPE")).mkString(delim)
    }
    (nodeRows ++ edgeRows).toSeq
  }

  protected def binPrefix: String = conf.importCallBinPrefix.getOrElse("bin/")

  override def constructImportCall(): String = {
    val v4 = importCall("import", "--database=", "--force=")
    val v5 = importCall("database import full", "", "--overwrite-destination=")
    val check = s"version=$$(${binPrefix}neo4j-admin --version | cut -d '.' -f 1)"
    s"#!/bin/bash\n$check\nif [[ $$version -ge 5 ]]; then\n\t$v5\nelse\n\t$v4\nfi"
  }

  private def escapeDelim(d: String): String = if (d == "\t") "\\t" else d

  private def importCall(importCmd: String, databaseCmd: String, wipeCmd: String): String = {
    val sb = new StringBuilder
    sb ++= s"${binPrefix}neo4j-admin $importCmd "
    sb ++= s"$databaseCmd${conf.dbName} "
    sb ++= s"""--delimiter="${escapeDelim(delim)}" """
    sb ++= s"""--array-delimiter="${escapeDelim(conf.arrayDelimiter)}" """
    if (conf.quote == "'") sb ++= s"""--quote="${conf.quote}" """
    else sb ++= s"--quote='${conf.quote}' "
    if (conf.wipe) sb ++= s"${wipeCmd}true "
    if (conf.skipBadRelationships) sb ++= "--skip-bad-relationships=true "
    if (conf.skipDuplicateNodes) sb ++= "--skip-duplicate-nodes=true "
    nodeLayouts.values.foreach { lay =>
      sb ++= s"""--nodes="${joinPath(filePrefix, s"${lay.fileLabel}-header.csv")},${joinPath(filePrefix, s"${lay.fileLabel}-part.*")}" """
    }
    edgeLayouts.values.foreach { lay =>
      sb ++= s"""--relationships="${joinPath(filePrefix, s"${lay.fileLabel}-header.csv")},${joinPath(filePrefix, s"${lay.fileLabel}-part.*")}" """
    }
    sb.toString
  }
}

/** ArangoDB arangoimport sink (reference: output/write/graph/_arangodb.py):
  * Neo4j-style part files with `_key`/`_from`/`_to` headers and one
  * arangoimp line per node collection. */
class ArangoCsvSink(ctx: KgContext, outDir: String) extends Neo4jCsvSink(ctx, outDir) {

  import BatchSink._

  override def importScriptName: String = "arangodb-import-call.sh"
  override protected def binPrefix: String = conf.importCallBinPrefix.getOrElse("")

  override def writeHeaders(): Unit = {
    nodeLayouts.values.foreach { lay =>
      val cols = Vector("_key") ++ lay.propKeys
      writeDriverFile(outDir, s"${lay.fileLabel}-header.csv", cols.mkString(delim))
    }
    edgeLayouts.values.foreach { lay =>
      val cols = Vector("_from", "_key") ++ lay.propKeys ++ Vector("_to")
      writeDriverFile(outDir, s"${lay.fileLabel}-header.csv", cols.mkString(delim))
    }
  }

  private def collectionOf(lay: LabelLayout): Option[String] = {
    val schemaClass =
      if (ctx.specs.contains(lay.label)) Some(lay.label)
      else ctx.schemaClassForEdgeLabel(lay.label)
    schemaClass.flatMap(c => ctx.extendedSchema.get(c))
      .flatMap(_.get("db_collection_name")).map(graft.schema.Y.str)
  }

  override def constructImportCall(): String = {
    val base = {
      val sb = new StringBuilder
      sb ++= s"${binPrefix}arangoimp --type csv "
      sb ++= s"""--separator="${if (delim == "\t") "\\t" else delim}" """
      if (conf.quote == "'") sb ++= s"""--quote="${conf.quote}" """
      else sb ++= s"--quote='${conf.quote}' "
      sb.toString
    }
    val nodeLines = nodeLayouts.values.flatMap { lay =>
      partsOf(lay.fileLabel).map { part =>
        val line = new StringBuilder(base)
        line ++= s"--headers-file ${joinPath(filePrefix, s"${lay.fileLabel}-header.csv")} "
        line ++= s"--file= ${joinPath(filePrefix, part)} "
        collectionOf(lay).foreach(c => line ++= s"--create-collection --collection $c ")
        line.toString
      }
    }
    val edgeLines = edgeLayouts.values.map { lay =>
      val line = new StringBuilder(base)
      line ++= s"--headers-file ${joinPath(filePrefix, s"${lay.fileLabel}-header.csv")} "
      line ++= s"--file= ${joinPath(filePrefix, s"${lay.fileLabel}-part.*")} "
      collectionOf(lay).foreach(c => line ++= s"--create-collection --create-collection-type edge --collection $c ")
      line.toString
    }
    (nodeLines ++ edgeLines).mkString("\n") + "\n"
  }
}
