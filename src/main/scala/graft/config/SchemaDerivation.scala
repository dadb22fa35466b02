package graft.config

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.exprs.JsonExprs.{expand_dots_json, json_residual}
import graft.exprs.exprs.ip_canonical
import graft.functions.{TextFunctions, TimeFunctions}

/** A schema leaf after flattening static objects, addressed both by path
  * (for struct access) and by the reference's flattened dotted name with
  * `\.` escaping (for the query language —
  * `/root/reference/src/config/mod.rs:132-162`). */
final case class ResolvedField(
    path: List[String],
    flatName: String,
    array: Boolean,
    fieldType: FieldType) {

  /** Storage column accessor (nested struct traversal). */
  def column: Column =
    path.tail.foldLeft(col(s"`${path.head}`"))((c, p) => c.getField(p))
}

/** Derives everything the engine needs from an [[IndexConfig]]:
  * the `from_json` raw-parse schema, the typed Parquet storage schema, the
  * ingest projection (with the reference's skip-document-on-parse-error
  * semantics, `src/commands/index.rs:150-157`), and the resolved-field
  * lookup used by the query compiler.
  *
  * Storage layout per split (one Parquet file group per commit):
  *  - one typed column per declared top-level field (static objects stay
  *    native nested structs — no flattening; Parquet/Catalyst handle
  *    pushdown into struct fields),
  *  - `_dynamic`: JSON text of all undeclared keys (dots expanded),
  *  - `_terms`: struct of pre-tokenized term arrays for every indexed
  *    text-ish field, so query-time term match is `array_contains` on a
  *    columnar array — no per-query tokenization of document text.
  */
final class SchemaDerivation(val config: IndexConfig) {

  import SchemaDerivation._

  val fields: List[FieldConfig] = config.schema.fields
  val topLevelNames: List[String] = fields.map(_.name)

  /** All leaves (static-object children flattened). */
  val resolved: List[ResolvedField] = {
    def walk(fs: List[FieldConfig], path: List[String], flat: Option[String]): List[ResolvedField] =
      fs.flatMap { f =>
        val esc = escape(f.name)
        val flatName = flat.map(p => s"$p.$esc").getOrElse(esc)
        f.fieldType match {
          case so: StaticObjectField =>
            walk(so.fields, path :+ f.name, Some(flatName))
          case t =>
            List(ResolvedField(path :+ f.name, flatName, f.array, t))
        }
      }
    walk(fields, Nil, None)
  }

  val byFlatName: Map[String, ResolvedField] = resolved.map(f => f.flatName -> f).toMap

  /** Longest declared dynamic_object PREFIX of a flat path that does not
    * itself resolve — tantivy json-field addressing: `resource.service`
    * routes into the declared `resource` json field, never the
    * catch-all. Returns the owner field and the remaining flat path
    * (dot-escaped segments) inside its JSON. */
  def dynamicOwner(flatName: String): Option[(ResolvedField, String)] = {
    val segs = SchemaDerivation.splitFlatName(flatName)
    (segs.length - 1 to 1 by -1).iterator.flatMap { n =>
      val prefix = segs.take(n).map(SchemaDerivation.escape).mkString(".")
      byFlatName.get(prefix).collect {
        case rf if rf.fieldType.isInstanceOf[DynamicObjectField] =>
          (rf, segs.drop(n).map(SchemaDerivation.escape).mkString("."))
      }
    }.nextOption()
  }

  /** Default search fields: every indexed leaf plus the catch-all. */
  val defaultFieldNames: List[String] =
    resolved.filter(_.fieldType.indexed).map(_.flatName) :+ Dynamic

  /** Leaves that get a pre-tokenized `_terms` entry — text fields only:
    * declared dynamic_object term queries tokenize the stored JSON at
    * query time (QueryCompiler's dyn case), so a precomputed entry for
    * them was pure dead storage (for the default `raw` tokenizer it
    * duplicated the whole payload per row). */
  val termsFields: List[(String, ResolvedField, String)] = resolved.collect {
    case f @ ResolvedField(_, flat, _, t: TextField) if t.tokenizer.isDefined =>
      (flat, f, t.tokenizer.get)
  }

  // ---- schemas ----------------------------------------------------------

  /** Leaf types as StringType so parse semantics (string coercion, format
    * cascades, magnitude inference) stay ours, not Jackson's. */
  val rawParseSchema: StructType = {
    def rawType(f: FieldConfig): DataType = f.fieldType match {
      case so: StaticObjectField =>
        StructType(so.fields.map(c => StructField(c.name, rawType(c), nullable = true)))
      case _ =>
        if (f.array) ArrayType(StringType) else StringType
    }
    StructType(fields.map(f => StructField(f.name, rawType(f), nullable = true)))
  }

  def storageLeafType(t: FieldType): DataType = t match {
    case _: TextField                       => StringType
    case n: NumberField if n.numType == "f64" => DoubleType
    case _: NumberField                     => LongType
    case _: BooleanField                    => BooleanType
    case _: DateTimeField                   => TimestampType
    case _: IpField                         => BinaryType
    case _: DynamicObjectField              => StringType
    case so: StaticObjectField =>
      StructType(so.fields.map(c => StructField(c.name, storageType(c), nullable = true)))
  }

  def storageType(f: FieldConfig): DataType = {
    val leaf = storageLeafType(f.fieldType)
    if (f.array) ArrayType(leaf) else leaf
  }

  val storageSchema: StructType = {
    val declared = fields.map(f => StructField(f.name, storageType(f), nullable = true))
    val terms = StructField(Terms, StructType(
      termsFields.map { case (flat, _, _) => StructField(flat, ArrayType(StringType)) } :+
        StructField(Dynamic, ArrayType(StringType))))
    StructType(declared :+ StructField(Dynamic, VariantType, nullable = true) :+ terms)
  }

  /** Format-1 (pre-variant) split layout: `_dynamic` as JSON text.
    * [[graft.engine.Catalog.readSplits]] upgrades such splits to the
    * variant shape at read time. */
  val legacyStorageSchema: StructType = StructType(storageSchema.map {
    case f if f.name == Dynamic => f.copy(dataType = StringType)
    case f                      => f
  })

  // ---- ingest projection ------------------------------------------------

  /** Typed value + parse-error flag for one leaf, from its raw string. */
  private def parseLeaf(raw: Column, t: FieldType, jsonPath: Option[String],
      value: Column): (Column, Column) = t match {
    case _: TextField =>
      (raw, lit(false))
    case n: NumberField =>
      val typed0 = n.numType match {
        case "f64" => raw.try_cast("double")
        case "u64" => when(raw.rlike("^\\+?\\d+$"), raw.try_cast("long"))
        case _     => when(raw.rlike("^[+-]?\\d+$"), raw.try_cast("long"))
      }
      val typed = guardParseString(n.parseString, typed0, jsonPath, value)
      (typed, raw.isNotNull && typed.isNull)
    case b: BooleanField =>
      val norm = lower(trim(raw))
      val typed0 = when(norm === "true", lit(true)).when(norm === "false", lit(false))
      val typed = guardParseString(b.parseString, typed0, jsonPath, value)
      (typed, raw.isNotNull && typed.isNull)
    case d: DateTimeField =>
      val typed = TimeFunctions.parseCascade(raw, d.formats)
      (typed, raw.isNotNull && typed.isNull)
    case _: IpField =>
      val typed = ip_canonical(raw)
      (typed, raw.isNotNull && typed.isNull)
    case dyn: DynamicObjectField =>
      // Re-extract from the original document via variant so JSON value
      // types (string quoting etc.) survive; from_json's StringType leaf
      // strips quotes from plain strings.
      val json = jsonPath match {
        case Some(p) => to_json(try_variant_get(try_parse_json(value), s"$$.$p", "variant"))
        case None    => raw
      }
      val typed = if (dyn.expandDots) expand_dots_json(json) else json
      (typed, lit(false))
    case _: StaticObjectField =>
      throw new IllegalStateException("static handled by caller")
  }

  /** `parse_string: false` (`/root/reference/src/config/number.rs:14-30`)
    * rejects string-typed JSON input. The raw-parse schema coerces every
    * leaf through StringType, so `100` and `"100"` are indistinguishable
    * there — probe the original document's variant type instead and null
    * out string-typed values, which the caller flags as a parse error
    * (skip-document semantics). Array elements keep lenient parsing (no
    * variant path into arrays). */
  private def guardParseString(parseString: Boolean, typed: Column,
      jsonPath: Option[String], value: Column): Column =
    if (parseString) typed
    else jsonPath match {
      case Some(p) =>
        val vt = schema_of_variant(try_variant_get(try_parse_json(value), s"$$.$p", "variant"))
        when(vt =!= "STRING", typed)
      case None => typed
    }

  /** (typed column, error flag) for a declared field subtree. */
  private def typedField(f: FieldConfig, rawParent: Column, path: List[String],
      value: Column): (Column, Column) = {
    val raw = rawParent.getField(f.name)
    f.fieldType match {
      case so: StaticObjectField =>
        val children = so.fields.map(c => typedField(c, raw, path :+ f.name, value))
        val typed = when(raw.isNull, lit(null).cast(storageType(f)))
          .otherwise(struct(children.map(_._1): _*).cast(storageType(f)))
        val err = children.map(_._2).reduceOption(_ || _).getOrElse(lit(false))
        (typed.as(f.name), err)
      case dyn: DynamicObjectField if f.array =>
        // from_json's StringType leaves strip quotes, making `123` and
        // `"123"` indistinguishable — re-extract each element from the
        // original document via variant (computed `$[i]` paths work), so
        // stored elements are exact JSON values like the scalar dyn case.
        val p = (path :+ f.name).mkString(".")
        val av = try_variant_get(try_parse_json(value), s"$$.$p", "variant")
        val elemJson = (i: Column) => {
          val j = to_json(try_variant_get(av, concat(lit("$["), i, lit("]")), "variant"))
          if (dyn.expandDots) expand_dots_json(j) else j
        }
        val typed = when(raw.isNull, lit(null).cast(storageType(f)))
          .otherwise(transform(sequence(lit(0), size(raw) - 1), elemJson))
        (typed.as(f.name), lit(false))
      case t if f.array =>
        val jsonPath = None // variant path inside arrays unsupported; raw semantics
        val parse1 = (e: Column) => parseLeaf(e, t, jsonPath, value)._1
        val typed = when(raw.isNull, lit(null).cast(storageType(f)))
          .otherwise(transform(raw, e => parse1(e)))
        val failing = t match {
          case _: TextField => lit(false)
          case _ => exists(raw, e => e.isNotNull && parse1(e).isNull)
        }
        (typed.as(f.name), raw.isNotNull && failing)
      case t =>
        val jsonPath = Some((path :+ f.name).mkString("."))
        val (typed, err) = parseLeaf(raw, t, jsonPath, value)
        (typed.cast(storageLeafType(t)).as(f.name), err)
    }
  }

  /** The ingest path: filter + two projections over a `value`
    * JSON-line DataFrame, computing the residual-JSON parse ONCE (the
    * catch-all terms tokenize the stored `_dynamic` column in the second
    * projection instead of re-parsing the raw line). */
  def ingest(lines: org.apache.spark.sql.DataFrame,
      value: Column): org.apache.spark.sql.DataFrame = {
    val (stage1, _, skip) = ingestStage1(value)
    val declared = fields.map(f => col(s"`${f.name}`"))
    // Catch-all terms tokenize the residual-JSON text with escape units
    // neutralized ([[graft.exprs.JsonEscapeNeutralize]] — the SAME
    // transform query-time `_dynamic`-path tokenization applies, see
    // [[graft.query.QueryCompiler.dynTokens]], so the two token streams
    // cannot desynchronize). The text is Jackson-CANONICAL (json_residual
    // / expand_dots_json re-render through Jackson, which only ever
    // escapes control characters, quotes, and backslashes — never
    // alphanumerics: a raw-input `"abc"` arrives decoded), and those
    // escapes all decode to token SEPARATORS, so after neutralization
    // every token of every decoded string value is a token of this
    // array. Dynamic-path queries and the per-split term digests both
    // rely on exactly that equality; without neutralization "a\nb" would
    // tokenize as [a, nb] and hide token b. (Tokenizing this text, not
    // `to_json(variant)`, skips a parse+render round trip per ingested
    // row.)
    val termsStruct = struct(
      termsFields.map { case (flat, _, _) => col(s"`__t__$flat`").as(flat) } :+
        TextFunctions.tokenize(
          graft.exprs.JsonExprs.json_escape_neutralize(col(DynJsonTmp)),
          "default").as(Dynamic): _*)
    lines
      .where(value.isNotNull && length(trim(value)) > 0)
      .where(!coalesce(skip, lit(true)))
      .select(stage1.map { case (c, tmp) =>
        tmp.map(n => c.as(n)).getOrElse(c)
      }: _*)
      .select(declared :+ col(Dynamic) :+ termsStruct.as(Terms): _*)
  }

  /** Stage 1: typed declared columns + `_dynamic` + per-text-field token
    * arrays (temp-named `__t__<flat>` so stage 2 can fold them into the
    * `_terms` struct). Returns ((column, temp-name), bare terms columns,
    * skip). */
  private def ingestStage1(
      value: Column): (Seq[(Column, Option[String])], List[Column], Column) = {
    val parsed = from_json(value, rawParseSchema)
    val perField = fields.map(f => typedField(f, parsed, Nil, value))
    // The residual JSON text (Jackson-canonical) is computed once and
    // kept under a temp name: storage gets its variant encoding
    // (format-2 splits), the catch-all terms tokenize the same text in
    // stage 2 without re-serializing.
    val dynJson = expand_dots_json(json_residual(value, topLevelNames))
    val dynamicCol = try_parse_json(dynJson).as(Dynamic)

    val typedByName: Map[String, Column] =
      fields.zip(perField).map { case (f, (c, _)) => f.name -> c }.toMap

    def leafTyped(rf: ResolvedField): Column =
      rf.path.tail.foldLeft(typedByName(rf.path.head))((c, p) => c.getField(p))

    val termsCols = termsFields.map { case (flat, rf, tok) =>
      TextFunctions.tokensOf(leafTyped(rf), tok, rf.array).as(flat)
    }

    // A corrupt line yields a struct of nulls in PERMISSIVE mode, not a
    // null struct — probe validity via the map parse, which IS null for
    // anything that isn't a JSON object.
    val corrupt = from_json(value, MapType(StringType, StringType)).isNull
    val errors = perField.map(_._2) :+ corrupt
    val skip = errors.reduce(_ || _)
    val cols: Seq[(Column, Option[String])] =
      perField.map { case (c, _) => (c, None: Option[String]) } ++
        Seq((dynamicCol, None: Option[String]),
          (dynJson, Some(DynJsonTmp): Option[String])) ++
        termsCols.zip(termsFields).map { case (c, (flat, _, _)) =>
          (c, Some(s"__t__$flat"))
        }
    (cols, termsCols, skip)
  }

  /** Storage → reference-shaped output JSON is built in the search module
    * (needs top-K rows only). */
}

object SchemaDerivation {
  val Dynamic = "_dynamic"
  val Terms = "_terms"

  /** Stage-1 temp column holding the Jackson-canonical residual-JSON
    * text (tokenized into the catch-all terms in stage 2, then dropped). */
  private[config] val DynJsonTmp = "__dyn_json"

  /** Variant path for a flattened dotted field name: bracket-quoted
    * segments, so a key containing a literal (escaped) dot addresses the
    * flat key instead of being misread as nesting — e.g. `a\.b` →
    * `$['a.b']`, `a.b` → `$['a']['b']`. None when the name cannot be
    * expressed: Spark's variant path grammar has NO escape inside
    * bracket quotes (`['` ~ `[^']*` ~ `']`), so a key containing a
    * single quote is unaddressable — callers treat that as no-match
    * (the pre-variant `get_json_object` behavior), never as an error. */
  def variantPath(flatName: String): Option[String] = {
    val segs = splitFlatName(flatName)
    if (segs.exists(_.contains("'"))) None
    else Some(segs.map(s => s"['$s']").mkString("$", "", ""))
  }

  def escape(name: String): String = name.replace(".", "\\.")
  def unescape(flat: String): String = flat.replace("\\.", ".")

  /** Split a flattened name on unescaped dots
    * (`/root/reference/src/config/mod.rs:132-145`). */
  def splitFlatName(s: String): List[String] = {
    val out = scala.collection.mutable.ListBuffer[String]()
    val cur = new StringBuilder
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (c == '\\' && i + 1 < s.length && s.charAt(i + 1) == '.') {
        cur.append('.'); i += 2
      } else if (c == '.') {
        out += cur.toString; cur.clear(); i += 1
      } else { cur.append(c); i += 1 }
    }
    out += cur.toString
    out.toList
  }
}
