package graft.sinks

import java.nio.file.{Files, Path, Paths, StandardCopyOption}
import scala.collection.immutable.ListMap
import scala.jdk.CollectionConverters._

import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.functions.{col, first}
import graft.{KgContext, Render}
import graft.model._
import graft.model.Props.Props

/** Per-label property layout for rendering + headers. */
final case class LabelLayout(
    label: String,            // internal (sentence-case or edge) label
    fileLabel: String,        // PascalCase, Neo4j-rule-sanitized file label
    propKeys: Vector[String], // ordered reference property keys
    propTypes: Vector[String],// declared or runtime type string per key
    labelsCell: String,       // node-only: rendered :LABEL cell
    skipId: Boolean,          // edge-only: omit id column
)

/** The Neo4j admin-import bulk sink: per-label part files + header files +
  * a v4/v5 dual import script (reference: output/write/_batch_writer.py +
  * output/write/graph/_neo4j.py).
  *
  * Spark-native realization: rows are rendered to final CSV lines by a typed
  * map (pipelined with the upstream dedup exchange, no extra shuffle) and
  * written with `partitionBy(fileLabel)` so per-label grouping, batching
  * (`maxRecordsPerFile` = the reference's `batch_size`) and part numbering
  * are handled by the distributed commit protocol; a cheap driver-side pass
  * renames the committed files into the reference's `{Label}-partNNN.csv`
  * naming grammar.
  */
final class Neo4jCsvSink(ctx: KgContext, outDir: String) extends Serializable {

  import Neo4jCsvSink._

  private val delim = ctx.config.delimiter
  private val conf = ctx.config

  // filled by write* calls (driver-side), consumed by header/import-call gen
  var nodeLayouts: ListMap[String, LabelLayout] = ListMap.empty
  var edgeLayouts: ListMap[String, LabelLayout] = ListMap.empty

  // ---------------------------------------------------------------- layout

  /** Reference property dict per label: schema-declared when available,
    * else the first encountered entity's properties with runtime type names
    * (reference: _batch_writer.py:440-475 nodes, :706-750 edges). */
  def nodeLayout(label: String, firstProps: Props): LabelLayout = {
    val spec = ctx.spec(label)
    val declared = spec.map(_.properties).getOrElse(ListMap.empty)
    val (keys, types) =
      if (declared.nonEmpty) {
        var d = declared.toVector
        d :+= ("id" -> "str")
        d :+= ("preferred_id" -> "str")
        if (conf.strictMode) d ++= Vector("source" -> "str", "version" -> "str", "licence" -> "str")
        (d.map(_._1), d.map(_._2))
      } else {
        (firstProps.map(_.k).toVector, firstProps.map(p => runtimeType(p.v)).toVector)
      }
    LabelLayout(label, fileLabel(label), keys, types, ctx.labelsCell(label), skipId = false)
  }

  def edgeLayout(label: String, firstProps: Props): LabelLayout = {
    val schemaClass = ctx.schemaClassForEdgeLabel(label)
    val declared = schemaClass.flatMap(ctx.spec).map(_.properties).getOrElse(ListMap.empty)
    val (keys, types) =
      if (declared.nonEmpty) {
        var d = declared.toVector
        if (conf.strictMode) d ++= Vector("source" -> "str", "version" -> "str", "licence" -> "str")
        (d.map(_._1), d.map(_._2))
      } else {
        (firstProps.map(_.k).toVector, firstProps.map(p => runtimeType(p.v)).toVector)
      }
    val skip = BuiltinRelLabels.contains(label) ||
      schemaClass.flatMap(ctx.spec).exists(!_.useId)
    LabelLayout(label, fileLabel(label), keys, types, labelsCell = null, skipId = skip)
  }

  // ---------------------------------------------------------------- writes

  /** Render + write all node part files. Two jobs: a per-label first-row
    * aggregate (layout discovery) and the partitioned write. */
  def writeNodes(ds: Dataset[KgNode]): Unit = {
    val spark = ds.sparkSession
    import spark.implicits._
    val firsts: Map[String, Props] =
      ds.groupBy(col("label")).agg(first(col("props")).as("props"))
        .as[(String, Seq[Prop])].collect().map { case (l, p) => l -> p.toVector }.toMap
    val layouts = firsts.map { case (l, p) => l -> nodeLayout(l, p) }
    nodeLayouts = nodeLayouts ++ ListMap(layouts.toSeq.sortBy(_._1): _*)

    val bc = spark.sparkContext.broadcast(layouts)
    val q = conf.quote; val d = delim; val ad = conf.arrayDelimiter
    val rendered = ds.map { n =>
      val lay = bc.value(n.label)
      val line = renderNodeLine(n, lay, d, ad, q)
      (lay.fileLabel, line)
    }.toDF("label", "value")
    writePartitioned(spark, rendered, outDir, conf.batchSize)
  }

  def writeEdges(ds: Dataset[KgEdge]): Unit = {
    val spark = ds.sparkSession
    import spark.implicits._
    val valid = ds.filter(e => e.src != null && e.src.nonEmpty && e.tgt != null && e.tgt.nonEmpty)
    val firsts: Map[String, Props] =
      valid.groupBy(col("label")).agg(first(col("props")).as("props"))
        .as[(String, Seq[Prop])].collect().map { case (l, p) => l -> p.toVector }.toMap
    val layouts = firsts.map { case (l, p) => l -> edgeLayout(l, p) }
    edgeLayouts = edgeLayouts ++ ListMap(layouts.toSeq.sortBy(_._1): _*)

    val bc = spark.sparkContext.broadcast(layouts)
    val q = conf.quote; val d = delim; val ad = conf.arrayDelimiter
    val rendered = valid.map { e =>
      val lay = bc.value(e.label)
      val line = renderEdgeLine(e, lay, d, ad, q)
      (lay.fileLabel, line)
    }.toDF("label", "value")
    writePartitioned(spark, rendered, outDir, conf.batchSize)
  }

  /** Flattened rel-as-node stream: nodes first (referential integrity, like
    * the reference writing RelAsNode nodes before edges,
    * _batch_writer.py:363-369), then both connector edges. */
  def writeRelAsNodes(ds: Dataset[RelAsNode]): Unit = {
    val spark = ds.sparkSession
    import spark.implicits._
    writeNodes(ds.map(_.node))
    writeEdges(ds.flatMap(r => Seq(r.sourceEdge, r.targetEdge)))
  }

  // --------------------------------------------------------------- headers

  def writeHeaders(): Unit = {
    nodeLayouts.values.foreach { lay =>
      val cols = Vector(":ID") ++ headerProps(lay) ++ Vector(":LABEL")
      writeDriverFile(Paths.get(outDir, s"${lay.fileLabel}-header.csv"), cols.mkString(delim))
    }
    edgeLayouts.values.foreach { lay =>
      val cols = Vector(":START_ID") ++
        (if (lay.skipId) Vector.empty else Vector("id")) ++
        headerProps(lay) ++ Vector(":END_ID", ":TYPE")
      writeDriverFile(Paths.get(outDir, s"${lay.fileLabel}-header.csv"), cols.mkString(delim))
    }
  }

  private def headerProps(lay: LabelLayout): Vector[String] =
    lay.propKeys.zip(lay.propTypes).map { case (k, t) => k + headerTypeSuffix(t) }

  /** (fileLabel, headerString) rows for every discovered label — the header
    * grammar as data (used by the correctness harness). */
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

  // ----------------------------------------------------------- import call

  def importScriptName: String = "neo4j-admin-import-call.sh"

  def constructImportCall(): String = {
    val v4 = importCall("import", "--database=", "--force=")
    val v5 = importCall("database import full", "", "--overwrite-destination=")
    val check = s"version=$$(${binPrefix}neo4j-admin --version | cut -d '.' -f 1)"
    s"#!/bin/bash\n$check\nif [[ $$version -ge 5 ]]; then\n\t$v5\nelse\n\t$v4\nfi"
  }

  def writeImportCall(): String = {
    val p = Paths.get(outDir, importScriptName)
    writeDriverFile(p, constructImportCall())
    p.toString
  }

  private def binPrefix: String = conf.importCallBinPrefix.getOrElse("bin/")
  private def filePrefix: String = conf.importCallFilePrefix.getOrElse(outDir)

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
      sb ++= s"""--nodes="${join(filePrefix, s"${lay.fileLabel}-header.csv")},${join(filePrefix, s"${lay.fileLabel}-part.*")}" """
    }
    edgeLayouts.values.foreach { lay =>
      sb ++= s"""--relationships="${join(filePrefix, s"${lay.fileLabel}-header.csv")},${join(filePrefix, s"${lay.fileLabel}-part.*")}" """
    }
    sb.toString
  }

  private def escapeDelim(d: String): String = if (d == "\t") "\\t" else d
  private def join(a: String, b: String): String =
    if (a.isEmpty) b else if (a.endsWith("/")) a + b else a + "/" + b

  private def fileLabel(label: String): String =
    graft.model.Naming.nameSentenceToPascal(graft.model.Naming.parseLabel(label))
}

object Neo4jCsvSink {

  val BuiltinRelLabels = Set("IS_SOURCE_OF", "IS_TARGET_OF", "IS_PART_OF")

  private val NumericBoolTypes =
    Set("int", "integer", "long", "float", "double", "dbl", "bool", "boolean")

  /** Runtime type name of a PV (the reference uses type(v).__name__). */
  def runtimeType(v: PV): String = if (v == null) "none" else v.t match {
    case "int" => "int"; case "float" => "float"; case "bool" => "bool"
    case "list" => "list"; case "none" => "none"; case _ => "str"
  }

  /** Header type suffix (reference: graph/_neo4j.py:105-125). */
  def headerTypeSuffix(t: String): String = t match {
    case "int" | "long" | "integer"       => ":long"
    case "int[]" | "long[]" | "integer[]" => ":long[]"
    case "float" | "double" | "dbl"       => ":double"
    case "float[]" | "double[]"           => ":double[]"
    case "bool" | "boolean"               => ":boolean"
    case "bool[]" | "boolean[]"           => ":boolean[]"
    case "str[]" | "string[]"             => ":string[]"
    case _                                => ""
  }

  /** One CSV cell (reference: _batch_writer.py:621-649). */
  def renderCell(p: PV, declaredType: String, adelim: String, q: String): String = {
    if (PV.isNone(p)) ""
    else if (NumericBoolTypes.contains(declaredType)) p.s
    else if (p.t == "list") Render.arrayString(p.arr, adelim, q)
    else Render.quote(p.s, q)
  }

  def renderNodeLine(n: KgNode, lay: LabelLayout, d: String, ad: String, q: String): String = {
    checkConsistent(n.props, lay, s"node ${n.id}", n.label)
    val cells = new StringBuilder(n.id)
    if (lay.propKeys.nonEmpty) {
      var i = 0
      val byKey = n.props.map(p => p.k -> p.v).toMap
      while (i < lay.propKeys.length) {
        cells ++= d
        cells ++= renderCell(byKey.getOrElse(lay.propKeys(i), PV.None_), lay.propTypes(i), ad, q)
        i += 1
      }
    }
    cells ++= d
    cells ++= lay.labelsCell
    cells.toString
  }

  def renderEdgeLine(e: KgEdge, lay: LabelLayout, d: String, ad: String, q: String): String = {
    checkConsistent(e.props, lay, s"edge ${e.src}-${e.tgt}", e.label)
    val byKey = e.props.map(p => p.k -> p.v).toMap
    val parts = Vector.newBuilder[String]
    parts += e.src
    if (!lay.skipId) parts += Option(e.relId).getOrElse("")
    lay.propKeys.zip(lay.propTypes).foreach { case (k, t) =>
      parts += renderCell(byKey.getOrElse(k, PV.None_), t, ad, q)
    }
    parts += e.tgt
    parts += graft.model.Naming.nameSentenceToPascal(e.label)
    parts.result().mkString(d)
  }

  /** Property-set consistency check (reference: _batch_writer.py:598-619):
    * every entity of a label must carry exactly the reference keys. */
  private def checkConsistent(props: Props, lay: LabelLayout, what: String, label: String): Unit = {
    val keys = props.map(_.k).toSet
    val ref = lay.propKeys.toSet
    if (keys != ref)
      throw new IllegalStateException(
        s"At least one $what of the class $label has more or fewer properties than another. " +
          s"Reference properties: ${lay.propKeys.mkString(",")}, entity properties: ${keys.mkString(",")}.")
  }

  /** partitionBy write + rename into the `{Label}-partNNN.csv` grammar. */
  def writePartitioned(spark: SparkSession, df: org.apache.spark.sql.DataFrame,
      outDir: String, batchSize: Long): Unit = {
    val tmp = Files.createTempDirectory("graft-neo4j-").toString
    df.write.mode("overwrite")
      .option("maxRecordsPerFile", batchSize)
      .partitionBy("label")
      .text(tmp)
    // driver-side rename pass: label=X/part-*.txt -> outDir/X-partNNN.csv,
    // continuing any existing numbering (reference: _batch_writer.py:925-975)
    val out = Paths.get(outDir)
    Files.createDirectories(out)
    val tmpPath = Paths.get(tmp)
    Files.list(tmpPath).iterator().asScala.toList
      .filter(p => Files.isDirectory(p) && p.getFileName.toString.startsWith("label="))
      .foreach { dir =>
        val label = unescapePartitionValue(dir.getFileName.toString.stripPrefix("label="))
        var next = nextPartNumber(out, label)
        Files.list(dir).iterator().asScala.toList
          .filter(p => p.getFileName.toString.startsWith("part-"))
          .sortBy(_.getFileName.toString)
          .foreach { f =>
            val target = out.resolve(f"$label-part$next%03d.csv")
            Files.move(f, target, StandardCopyOption.REPLACE_EXISTING)
            next += 1
          }
      }
    deleteRecursively(tmpPath)
  }

  private def nextPartNumber(out: Path, label: String): Int = {
    if (!Files.isDirectory(out)) return 0
    val re = (java.util.regex.Pattern.quote(label) + "-part(\\d+)\\.csv").r
    Files.list(out).iterator().asScala.map(_.getFileName.toString).collect {
      case re(n) => n.toInt
    }.maxOption.map(_ + 1).getOrElse(0)
  }

  private def unescapePartitionValue(s: String): String =
    java.net.URLDecoder.decode(s.replace("+", "%2B"), "UTF-8")

  private def deleteRecursively(p: Path): Unit = {
    if (Files.isDirectory(p)) Files.list(p).iterator().asScala.foreach(deleteRecursively)
    Files.deleteIfExists(p)
  }

  def writeDriverFile(p: Path, content: String): Unit = {
    Files.createDirectories(p.getParent)
    Files.writeString(p, content)
  }
}
