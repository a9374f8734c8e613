package graft.sinks

import org.apache.spark.sql.Dataset
import graft.model.{KgEdge, KgNode, RelAsNode}

/** Common surface of every output writer (reference: the `_Writer` base,
  * output/write/_writer.py): batch CSV grammars, RDF, plain CSV, NetworkX.
  * `KgSession` drives any of them interchangeably. */
trait EntitySink extends Serializable {
  def writeNodes(ds: Dataset[KgNode]): Unit
  def writeEdges(ds: Dataset[KgEdge]): Unit
  def writeRelAsNodes(ds: Dataset[RelAsNode]): Unit
  def writeImportCall(): String
}
