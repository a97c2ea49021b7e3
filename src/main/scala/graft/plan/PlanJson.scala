package graft.plan

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
import com.fasterxml.jackson.databind.node.{ArrayNode, ObjectNode, JsonNodeFactory}
import scala.jdk.CollectionConverters._

/** JSON codec for the plan IR.
  *
  * Wire format (kept verbatim from the reference so the 80 golden plans in
  * Semantic-OLAP/datas/evaluate_datas.json parse directly):
  * `[{"operator_name"|"operator": str, "parameters"|"params": {...}}, ...]`.
  * Encoding always emits the normalized `operator_name`/`parameters` keys
  * (Exection_Agent.py:312-370).
  */
object PlanJson {
  private val mapper = new ObjectMapper()
  private val nf = JsonNodeFactory.instance

  // ------------------------------------------------------------- decoding

  def decodePlan(json: String): Seq[LogicalOp] = {
    val root = mapper.readTree(json)
    require(root.isArray, s"plan must be a JSON array, got: ${root.getNodeType}")
    root.asScala.map(decodeOp).toSeq
  }

  def decodeOp(n: JsonNode): LogicalOp = {
    val name =
      if (n.has("operator_name")) n.get("operator_name").asText
      else if (n.has("operator")) n.get("operator").asText
      else sys.error(s"plan entry missing operator name: $n")
    val p = Option(n.get("parameters")).orElse(Option(n.get("params")))
      .getOrElse(nf.objectNode())
    import LogicalOp._
    name match {
      case "sem_filter" =>
        SemFilter(strSeq(p, "columns"), str(p, "condition"))
      case "keyword_filter" =>
        // corpus uses both "contain" and "contains" (evaluate_datas.json)
        val rel = strOr(p, "relation", "contains") match {
          case "contain" | "contains"        => "contains"
          case "contained" | "contained_in"  => "contained_in"
          case other                         => other
        }
        KeywordFilter(strSeq(p, "columns"), strSeq(p, "keywords"),
          strOr(p, "logic", "and"), rel)
      case "num_filter" =>
        val conds = Option(p.get("conditions")) match {
          case Some(cs) if cs.isArray =>
            cs.asScala.map { c =>
              NumCondition(str(c, "column"), num(c, "threshold"),
                strOr(c, "operator", ">"))
            }.toSeq
          case _ => // single-condition shorthand (filter_numeric kernel shape)
            Seq(NumCondition(str(p, "column"), num(p, "threshold"),
              strOr(p, "operator", ">")))
        }
        NumFilter(conds, strOr(p, "logic", "and"))
      case "sem_map" =>
        SemMap(strSeq(p, "columns"), str(p, "map_description"),
          str(p, "keyword"))
      case "sem_group" =>
        // corpus carries the description under either key (24 map_ / 23 group_)
        val desc = optStr(p, "group_description")
          .orElse(optStr(p, "map_description")).getOrElse("")
        SemGroup(strSeq(p, "columns"), desc, str(p, "keyword"))
      case "sem_reduce" =>
        SemReduce(strSeq(p, "columns"), optStr(p, "group_by"))
      case "num_reduce" =>
        val aggs = Option(p.get("agg")) match {
          case Some(a) if a.isArray => a.asScala.map(_.asText).toSeq
          case Some(a)              => Seq(a.asText)
          case None                 => Seq.empty
        }
        NumReduce(strSeq(p, "columns"), aggs, optStr(p, "group_by"))
      case "count" =>
        CountOp(strOr(p, "group_by", ""), strSeq(p, "columns"))
      case "num_topk" =>
        NumTopK(str(p, "column"), intOr(p, "k", 1), strOr(p, "order", "desc"))
      case "sem_topk" =>
        val cols =
          if (p.has("columns")) strSeq(p, "columns")
          else if (p.has("column")) Seq(str(p, "column"))
          else Seq.empty
        SemTopK(cols, strOr(p, "query", ""), intOr(p, "k", 1))
      case other =>
        Opaque(other, jsonToScala(p).asInstanceOf[Map[String, Any]])
    }
  }

  def decodeLogic(n: JsonNode): LogicTree =
    if (n.isArray && n.size() > 0 &&
        (n.get(0).asText == "AND" || n.get(0).asText == "OR")) {
      LogicTree.Node(n.get(0).asText,
        n.asScala.drop(1).map(decodeLogic).toSeq)
    } else if (n.isNumber || n.isTextual) {
      LogicTree.Leaf(n.asInt())
    } else sys.error(s"bad logic tree node: $n")

  def decodeLogic(json: String): LogicTree = decodeLogic(mapper.readTree(json))

  // ------------------------------------------------------------- encoding

  def encodePlan(plan: Seq[LogicalOp]): String = {
    val arr = nf.arrayNode()
    plan.foreach(op => arr.add(encodeOp(op)))
    mapper.writeValueAsString(arr)
  }

  def encodeOp(op: LogicalOp): ObjectNode = {
    import LogicalOp._
    val o = nf.objectNode()
    o.put("operator_name", op.name)
    val p = o.putObject("parameters")
    op match {
      case SemFilter(cols, cond) =>
        putStrs(p, "columns", cols); p.put("condition", cond)
      case KeywordFilter(cols, kws, logic, rel) =>
        putStrs(p, "columns", cols); putStrs(p, "keywords", kws)
        p.put("logic", logic); p.put("relation", rel)
      case NumFilter(conds, logic) =>
        val cs = p.putArray("conditions")
        conds.foreach { c =>
          val cn = cs.addObject()
          cn.put("column", c.column); putNum(cn, "threshold", c.threshold)
          cn.put("operator", c.op)
        }
        p.put("logic", logic)
      case SemMap(cols, desc, kw) =>
        putStrs(p, "columns", cols); p.put("map_description", desc)
        p.put("keyword", kw)
      case SemGroup(cols, desc, kw) =>
        putStrs(p, "columns", cols); p.put("group_description", desc)
        p.put("keyword", kw)
      case SemReduce(cols, gb) =>
        putStrs(p, "columns", cols); gb.foreach(p.put("group_by", _))
      case NumReduce(cols, aggs, gb) =>
        putStrs(p, "columns", cols); putStrs(p, "agg", aggs)
        gb.foreach(p.put("group_by", _))
      case CountOp(gb, cols) =>
        p.put("group_by", gb); putStrs(p, "columns", cols)
      case NumTopK(col, k, order) =>
        p.put("column", col); p.put("k", k); p.put("order", order)
      case SemTopK(cols, q, k) =>
        putStrs(p, "columns", cols); p.put("query", q); p.put("k", k)
      case Opaque(_, params) =>
        params.foreach { case (k, v) => putAny(p, k, v) }
    }
    o
  }

  def encodeLogic(t: LogicTree): String = mapper.writeValueAsString(logicNode(t))

  private def logicNode(t: LogicTree): JsonNode = t match {
    case LogicTree.Leaf(id) => nf.numberNode(id)
    case LogicTree.Node(op, cs) =>
      val a = nf.arrayNode(); a.add(op); cs.foreach(c => a.add(logicNode(c))); a
  }

  // --------------------------------------------------------------- helpers

  private def str(n: JsonNode, k: String): String = {
    val v = n.get(k)
    require(v != null, s"missing key '$k' in $n")
    v.asText
  }
  private def strOr(n: JsonNode, k: String, d: String): String =
    Option(n.get(k)).filterNot(_.isNull).map(_.asText).getOrElse(d)
  private def optStr(n: JsonNode, k: String): Option[String] =
    Option(n.get(k)).filterNot(_.isNull).map(_.asText).filter(_.nonEmpty)
  private def intOr(n: JsonNode, k: String, d: Int): Int =
    Option(n.get(k)).filterNot(_.isNull).map(_.asInt).getOrElse(d)
  private def num(n: JsonNode, k: String): Double = {
    val v = n.get(k)
    require(v != null, s"missing key '$k' in $n")
    if (v.isNumber) v.asDouble else v.asText.trim.toDouble
  }
  private def strSeq(n: JsonNode, k: String): Seq[String] =
    Option(n.get(k)) match {
      case Some(a) if a.isArray => a.asScala.map(_.asText).toSeq
      case Some(v) if !v.isNull => Seq(v.asText)
      case _                    => Seq.empty
    }
  private def putStrs(o: ObjectNode, k: String, vs: Seq[String]): Unit = {
    val a = o.putArray(k); vs.foreach(a.add)
  }
  private def putNum(o: ObjectNode, k: String, d: Double): Unit =
    if (d == math.floor(d) && !d.isInfinite && math.abs(d) < 1e15)
      o.put(k, d.toLong)
    else o.put(k, d)
  private def putAny(o: ObjectNode, k: String, v: Any): Unit = v match {
    case null         => o.putNull(k)
    case s: String    => o.put(k, s)
    case i: Int       => o.put(k, i)
    case l: Long      => o.put(k, l)
    case d: Double    => putNum(o, k, d)
    case b: Boolean   => o.put(k, b)
    case m: Map[_, _] =>
      val child = o.putObject(k)
      m.foreach { case (mk, mv) => putAny(child, mk.toString, mv) }
    case xs: Seq[_] =>
      val a = o.putArray(k)
      xs.foreach {
        case s: String  => a.add(s)
        case i: Int     => a.add(i)
        case l: Long    => a.add(l)
        case d: Double  => a.add(d)
        case b: Boolean => a.add(b)
        case other      => a.add(other.toString)
      }
    case other => o.put(k, other.toString)
  }

  private def jsonToScala(n: JsonNode): Any =
    if (n.isObject)
      n.properties().asScala.map(e => e.getKey -> jsonToScala(e.getValue)).toMap
    else if (n.isArray) n.asScala.map(jsonToScala).toSeq
    else if (n.isTextual) n.asText
    else if (n.isIntegralNumber) n.asLong
    else if (n.isNumber) n.asDouble
    else if (n.isBoolean) n.asBoolean
    else null
}
