package graft.schema

import scala.collection.immutable.ListMap
import graft.model.Naming

/** Typed, broadcastable view of one expanded schema class. */
final case class ClassSpec(
    name: String,
    representedAs: String, // "node" | "edge"
    preferredId: String,
    inputLabels: List[String],
    isA: List[String],
    properties: ListMap[String, String], // declared prop -> type string
    excludeProperties: List[String],
    labelAsEdge: Option[String],
    synonymFor: Option[String],
    useId: Boolean,
    virtual: Boolean,
    sources: List[String],
) extends Serializable

/** The schema-expansion algebra: turns the user schema config into the
  * "extended schema" with vertical property inheritance and horizontal
  * virtual leaves (reference: biocypher/_mapping.py:46-294).
  *
  * Driver-side metadata work on a tiny map — pure Scala, broadcast once.
  */
object SchemaExpander {

  type Entry = ListMap[String, Y]
  type Schema = ListMap[String, Entry]

  def parseYaml(text: String): Schema = {
    YamlLite.parse(text).collect { case (k, YM(m)) => k -> m }
      .foldLeft(ListMap.empty[String, Entry]) { case (acc, (k, v)) => acc + (k -> v) }
  }

  /** Mirrors `OntologyMapping._extend_schema`. */
  def extend(schemaIn: Schema): Schema = {
    var d: Schema = schemaIn
    var extended = ListMap.empty[String, Entry]

    // pass 1: entities directly present in the ontology (no is_a);
    // default preferred_id to "id" for every entity
    d = d.map { case (k, v) =>
      if (!v.contains("represented_as")) k -> v
      else {
        val pid = v.get("preferred_id") match {
          case None | Some(YS("")) | Some(YL(Nil)) => v + ("preferred_id" -> YS("id"))
          case Some(_)                             => v
        }
        k -> pid
      }
    }
    d.foreach { case (k, v) =>
      if (v.contains("represented_as") && !v.contains("is_a")) extended += (k -> v)
    }

    // vertical property inheritance (mutates d like the reference)
    d = verticalInheritance(d, schemaIn)

    // pass 2: entries with is_a (loop guard: k == is_a string)
    d.foreach { case (k, v) =>
      v.get("is_a") match {
        case Some(YS(p)) if p == k => // loop; drop
        case Some(_)               => extended += (k -> v)
        case None                  =>
      }
    }

    // horizontal inheritance: virtual leaves for list preferred_id / source
    d.foreach { case (k, v) =>
      if (v.contains("represented_as")) {
        (v.get("preferred_id"), v.get("source")) match {
          case (Some(YL(pids)), _) => extended = extended ++ horizontalPid(k, v, pids)
          case (_, Some(YL(srcs))) => extended = extended ++ horizontalSource(k, v, srcs)
          case _                   =>
        }
      }
    }
    extended
  }

  private def inputLabelOf(v: Entry): Option[Y] =
    v.get("input_label").orElse(v.get("label_in_input"))

  private def verticalInheritance(dIn: Schema, original: Schema): Schema = {
    var d = dIn
    d.foreach { case (k, v) =>
      if (v.contains("represented_as") && v.contains("is_a") &&
        v.get("inherit_properties").contains(YB(true))) {
        val parent = Y.strings(v("is_a")).head
        val parentProps = original.get(parent).flatMap(_.get("properties")) match {
          case Some(YM(m)) => m
          case _           => ListMap.empty[String, Y]
        }
        val parentExcl = original.get(parent).flatMap(_.get("exclude_properties"))
        var nv = v
        val childProps = nv.get("properties") match {
          case Some(YM(m)) => m
          case _           => ListMap.empty[String, Y]
        }
        if (parentProps.nonEmpty) nv += ("properties" -> YM(childProps ++ parentProps))
        else if (!nv.contains("properties")) nv += ("properties" -> YM(ListMap.empty))
        parentExcl match {
          case Some(pe) =>
            val childExcl = nv.get("exclude_properties").map(Y.strings).getOrElse(Nil)
            val merged = (childExcl ++ Y.strings(pe)).distinct
            nv += ("exclude_properties" -> YL(merged.map(YS)))
          case None =>
            if (!nv.contains("exclude_properties"))
              nv += ("exclude_properties" -> YM(ListMap.empty))
        }
        d += (k -> nv)
      }
    }
    d
  }

  private val coreAttrsPid =
    Set("is_a", "preferred_id", "input_label", "label_in_input", "represented_as")
  private val coreAttrsSource =
    Set("is_a", "source", "input_label", "label_in_input", "represented_as")

  private def horizontalPid(key: String, v: Entry, pids: List[Y]): Schema = {
    val labels = inputLabelOf(v).map(Y.toList).getOrElse(Nil)
    val reps = v("represented_as") match {
      case YL(l)  => l
      case scalar => List.fill(math.max(pids.length, labels.length))(scalar)
    }
    makeLeaves(key, v, pids.map(Y.str), labels, reps, coreAttrsPid, isSource = false)
  }

  private def horizontalSource(key: String, v: Entry, srcs: List[Y]): Schema = {
    val labels = inputLabelOf(v).map(Y.toList) match {
      case Some(l) if l.length > 1 => l
      case Some(l)                 => List.fill(srcs.length)(l.headOption.getOrElse(YS("")))
      case None                    => Nil
    }
    val reps = v("represented_as") match {
      case YL(l)  => l
      case scalar => List.fill(srcs.length)(scalar)
    }
    makeLeaves(key, v, srcs.map(Y.str), labels, reps, coreAttrsSource, isSource = true)
  }

  private def makeLeaves(
      key: String,
      v: Entry,
      ids: List[String],
      labels: List[Y],
      reps: List[Y],
      coreAttrs: Set[String],
      isSource: Boolean,
  ): Schema = {
    var leaves = ListMap.empty[String, Entry]
    ids.lazyZip(labels).lazyZip(reps).foreach { (id, lab, rep) =>
      val skey = id + "." + key
      var sv = ListMap[String, Y](
        (if (isSource) "source" else "preferred_id") -> YS(id),
        "input_label" -> lab,
        "represented_as" -> rep,
        "virtual" -> YB(true),
      )
      sv += ("is_a" -> (v.get("is_a") match {
        case Some(YL(l))  => YL(YS(key) :: l)
        case Some(scalar) => YL(List(YS(key), scalar))
        case None         => YS(key)
      }))
      v.foreach { case (k2, v2) => if (!coreAttrs.contains(k2)) sv += (k2 -> v2) }
      leaves += (skey -> sv)
    }
    leaves
  }

  /** Typed view over the extended schema for broadcasting. */
  def specs(extended: Schema): ListMap[String, ClassSpec] =
    extended.map { case (k, v) =>
      k -> ClassSpec(
        name = k,
        representedAs = v.get("represented_as").map {
          case YL(l) => l.headOption.map(Y.str).getOrElse("")
          case s     => Y.str(s)
        }.getOrElse(""),
        preferredId = v.get("preferred_id").map {
          case YL(l) => l.map(Y.str).mkString(",") // parent entries keep list form
          case s     => Y.str(s)
        }.getOrElse("id"),
        inputLabels = inputLabelOf(v).map(Y.strings).getOrElse(Nil),
        isA = v.get("is_a").map(Y.strings).getOrElse(Nil),
        properties = v.get("properties") match {
          case Some(YM(m)) =>
            m.foldLeft(ListMap.empty[String, String]) { case (acc, (pk, pv)) =>
              acc + (pk -> Y.str(pv))
            }
          case _ => ListMap.empty
        },
        excludeProperties = v.get("exclude_properties") match {
          case Some(YM(m)) if m.isEmpty => Nil
          case Some(e)                  => Y.strings(e)
          case None                     => Nil
        },
        labelAsEdge = v.get("label_as_edge").map(Y.str),
        synonymFor = v.get("synonym_for").map(Y.str),
        useId = !v.get("use_id").contains(YB(false)),
        virtual = v.get("virtual").contains(YB(true)),
        sources = v.get("source").map(Y.strings).getOrElse(Nil),
      )
    }

  /** input label -> class-name map; later entries win for duplicate labels
    * (reference: _translate.py:329-352). */
  def inputLabelMap(extended: Schema): Map[String, String] = {
    var m = Map.empty[String, String]
    extended.foreach { case (k, v) =>
      inputLabelOf(v).map(Y.strings).getOrElse(Nil).foreach(lab => m += (lab -> k))
    }
    m
  }

  /** Cypher-rewrite mappings: input label -> PascalCase output label
    * (label_as_edge wins over class name; reference: _translate.py:336-351).
    */
  def translationMappings(extended: Schema): (Map[String, String], Map[String, List[String]]) = {
    var fwd = Map.empty[String, String]
    var rev = Map.empty[String, List[String]]
    extended.foreach { case (k, v) =>
      val labels = inputLabelOf(v).map(Y.strings).getOrElse(Nil)
      val target = v.get("label_as_edge").map(Y.str).getOrElse(k)
      val pascal = Naming.nameSentenceToPascal(target)
      labels.foreach(l => fwd += (l -> pascal))
      rev += (pascal -> labels)
    }
    (fwd, rev)
  }
}
