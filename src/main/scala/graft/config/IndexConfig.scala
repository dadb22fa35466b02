package graft.config

import scala.jdk.CollectionConverters._

import org.yaml.snakeyaml.{LoaderOptions, Yaml}
import org.yaml.snakeyaml.constructor.SafeConstructor

/** Index configuration model mirroring the reference's YAML schema
  * (`/root/reference/src/config/mod.rs:92-259` and the per-type files in
  * `src/config/`). The reference serializes field types with serde-yaml
  * `!tag` enum syntax (`type: !datetime {...}` — see
  * `/root/reference/example_config.yaml`); [[IndexConfig.fromYaml]]
  * accepts both that syntax (via tag preprocessing) and the plain
  * `type: {kind: datetime, ...}` form.
  */
sealed trait FieldType {
  def indexed: Boolean
  def stored: Boolean
}

/** indexed: None = not indexed; Some(tokenizer) = indexed with tokenizer. */
final case class TextField(
    stored: Boolean = true,
    fastNormalizer: Option[String] = None, // None | Some("default") | Some("raw")
    tokenizer: Option[String] = Some("default"),
    record: String = "basic",
    fieldnorms: Boolean = true
) extends FieldType { def indexed: Boolean = tokenizer.isDefined }

final case class NumberField(
    numType: String, // u64 | i64 | f64
    stored: Boolean = true,
    indexed: Boolean = true,
    fast: Boolean = false,
    parseString: Boolean = true
) extends FieldType

final case class BooleanField(
    stored: Boolean = true,
    indexed: Boolean = true,
    fast: Boolean = false,
    parseString: Boolean = true
) extends FieldType

final case class DateTimeField(
    stored: Boolean = true,
    indexed: Boolean = true,
    fastPrecision: Option[String] = None, // seconds|milliseconds|microseconds|nanoseconds
    formats: List[String] = List("rfc3339", "timestamp")
) extends FieldType

final case class IpField(
    stored: Boolean = true,
    indexed: Boolean = true,
    fast: Boolean = false
) extends FieldType

final case class DynamicObjectField(
    stored: Boolean = true,
    fastNormalizer: Option[String] = Some("default"),
    tokenizer: Option[String] = Some("raw"),
    expandDots: Boolean = true
) extends FieldType { def indexed: Boolean = tokenizer.isDefined }

final case class StaticObjectField(fields: List[FieldConfig]) extends FieldType {
  def indexed: Boolean = false // children carry their own indexed flags
  def stored: Boolean = true
}

final case class FieldConfig(name: String, array: Boolean, fieldType: FieldType)

final case class IndexSchema(fields: List[FieldConfig], timeField: Option[String])

final case class IndexConfig(
    name: String,
    path: String,
    version: Int,
    schema: IndexSchema
) {
  /** Validation from the reference's create command
    * (`src/commands/create.rs:9-22`): arrays of static objects are
    * rejected. Tokenizer names are checked here too so a typo fails at
    * CREATE with the field named, not at first ingest (the `_terms` and
    * digest builds both feed the name to the tokenizer dispatch). */
  def validate(): Unit = {
    def checkTok(name: String, tok: Option[String]): Unit = tok.foreach { t =>
      require(graft.functions.TextFunctions.KnownTokenizers(t),
        s"field '$name': unknown tokenizer '$t' (expected one of " +
          graft.functions.TextFunctions.KnownTokenizers.toList.sorted.mkString(", ") + ")")
    }
    def walk(fs: List[FieldConfig]): Unit = fs.foreach { f =>
      f.fieldType match {
        case so: StaticObjectField =>
          require(!f.array, s"field '${f.name}': array of static_object is not supported")
          walk(so.fields)
        case t: TextField          => checkTok(f.name, t.tokenizer)
        case d: DynamicObjectField => checkTok(f.name, d.tokenizer)
        case _ =>
      }
    }
    walk(schema.fields)
  }
}

object IndexConfig {

  /** The `_dynamic` catch-all field's fixed configuration
    * (`/root/reference/src/commands/mod.rs:38-51`): stored, not fast,
    * indexed with the default tokenizer, expand_dots on. */
  val DynamicCatchAll: DynamicObjectField =
    DynamicObjectField(stored = true, fastNormalizer = None,
      tokenizer = Some("default"), expandDots = true)

  def fromYaml(yamlText: String): IndexConfig = {
    val yaml = new Yaml(new SafeConstructor(new LoaderOptions))
    val root = yaml.load[java.util.Map[String, Object]](preprocessTags(yamlText))
    val m = root.asScala
    val schemaM = Option(m.getOrElse("schema", null))
      .map(_.asInstanceOf[java.util.Map[String, Object]].asScala)
      .getOrElse(scala.collection.mutable.Map.empty[String, Object])
    val fields = Option(schemaM.getOrElse("fields", null))
      .map(_.asInstanceOf[java.util.List[Object]].asScala.toList)
      .getOrElse(Nil)
      .map(f => parseField(f.asInstanceOf[java.util.Map[String, Object]].asScala.toMap))
    val cfg = IndexConfig(
      name = m("name").toString,
      path = m.getOrElse("path", "").toString,
      version = m.get("version").map(_.toString.toInt).getOrElse(1),
      schema = IndexSchema(fields,
        Option(schemaM.getOrElse("time_field", null)).map(_.toString))
    )
    cfg.validate()
    cfg
  }

  /** Rewrite serde-yaml `!tag` enum values into `{kind: tag, ...}` maps so
    * SnakeYAML's SafeConstructor can load them. Handles both block form
    * (`type: !datetime` + indented options) and bare form (`type: !text`).
    */
  private[config] def preprocessTags(text: String): String = {
    val lines = text.split("\n", -1).toBuffer
    val tagLine = """^(\s*)([\w-]+):\s*!(\w+)\s*(\{.*\})?\s*$""".r
    var i = 0
    val out = scala.collection.mutable.ArrayBuffer[String]()
    while (i < lines.length) {
      lines(i) match {
        case tagLine(indent, key, tag, flow) if flow != null =>
          // inline flow mapping: type: !number {type: u64}
          val inner = flow.trim.stripPrefix("{").stripSuffix("}").trim
          val merged = if (inner.isEmpty) s"{kind: $tag}" else s"{kind: $tag, $inner}"
          out += s"$indent$key: $merged"
        case tagLine(indent, key, tag, _) =>
          // block form: options (if any) are on following, deeper-indented lines
          val childIndent = lines.drop(i + 1)
            .find(l => l.trim.nonEmpty)
            .map(l => l.takeWhile(_ == ' ').length)
            .filter(_ > indent.length)
          val kindIndent = childIndent.map(" " * _).getOrElse(indent + "  ")
          out += s"$indent$key:"
          out += s"${kindIndent}kind: $tag"
        case other => out += other
      }
      i += 1
    }
    out.mkString("\n")
  }

  private def parseField(m: Map[String, Object]): FieldConfig = {
    val name = m("name").toString
    val array = m.get("array").exists(_.toString.toBoolean)
    val t = m("type") match {
      case s: String => parseType(s, Map.empty) // bare string: type: text
      case tm: java.util.Map[_, _] =>
        val opts = tm.asInstanceOf[java.util.Map[String, Object]].asScala.toMap
        parseType(opts("kind").toString, opts - "kind")
      case other => throw new IllegalArgumentException(s"bad type for field $name: $other")
    }
    FieldConfig(name, array, t)
  }

  private def bool(o: Object): Boolean = o.toString.toBoolean

  /** `indexed: false|true|{...}` and `fast: false|true|raw` tri-states. */
  private def parseType(kind: String, opts: Map[String, Object]): FieldType = {
    def stored = opts.get("stored").forall(bool)
    def indexedBool = opts.get("indexed").forall(bool)
    def fastBool = opts.get("fast").exists(bool)
    def parseString = opts.get("parse_string").forall(bool)

    kind match {
      case "text" =>
        val fastNorm = opts.get("fast") match {
          case None => None
          case Some(v) => v.toString match {
            case "false" => None
            case "true"  => Some("default")
            case "raw"   => Some("raw")
            case other   => Some(other)
          }
        }
        val (tok, record, fieldnorms) = opts.get("indexed") match {
          case None => (Some("default"), "basic", true)
          case Some(v: java.util.Map[_, _]) =>
            val im = v.asInstanceOf[java.util.Map[String, Object]].asScala
            (Some(im.get("tokenizer").map(_.toString).getOrElse("default")),
              im.get("record").map(_.toString).getOrElse("basic"),
              im.get("fieldnorms").forall(bool))
          case Some(v) if v.toString == "false" => (None, "basic", true)
          case Some(_)                          => (Some("default"), "basic", true)
        }
        TextField(stored, fastNorm, tok, record, fieldnorms)

      case "number" =>
        NumberField(opts.getOrElse("type", "i64").toString, stored, indexedBool,
          fastBool, parseString)

      case "boolean" =>
        BooleanField(stored, indexedBool, fastBool, parseString)

      case "datetime" =>
        val fastPrec = opts.get("fast").map(_.toString) match {
          case None | Some("false") => None
          case Some("true") | Some("seconds") => Some("seconds")
          case Some(p) => Some(p)
        }
        val formats = opts.get("formats") match {
          case Some(l: java.util.List[_]) => l.asScala.map(_.toString).toList
          case _ => List("rfc3339", "timestamp")
        }
        DateTimeField(stored, indexedBool, fastPrec, formats)

      case "ip" =>
        IpField(stored, indexedBool, fastBool)

      case "dynamic_object" =>
        val fastNorm = opts.get("fast").map(_.toString) match {
          case None => Some("default") // dynamic_object fast defaults true
          case Some("false") => None
          case Some("true") => Some("default")
          case Some(other) => Some(other)
        }
        val tok = opts.get("indexed") match {
          case None => Some("raw") // default indexed with raw tokenizer
          case Some(v: java.util.Map[_, _]) =>
            val im = v.asInstanceOf[java.util.Map[String, Object]].asScala
            Some(im.get("tokenizer").map(_.toString).getOrElse("raw"))
          case Some(v) if v.toString == "false" => None
          case Some(_) => Some("raw")
        }
        val expandDots = opts.get("expand_dots").forall(bool)
        DynamicObjectField(stored, fastNorm, tok, expandDots)

      case "static_object" =>
        val children = opts.get("fields") match {
          case Some(l: java.util.List[_]) =>
            l.asScala.toList.map(f =>
              parseField(f.asInstanceOf[java.util.Map[String, Object]].asScala.toMap))
          case _ => Nil
        }
        StaticObjectField(children)

      case other => throw new IllegalArgumentException(s"unknown field type: $other")
    }
  }
}
