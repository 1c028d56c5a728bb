package graft.core

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.model.MetaRow

/** MetaManager — the entries_meta KV semantics
  * (`src/library/metamanager.cpp`). A key ending in `s` is *plural*
  * (list: multiple rows per path+key, add appends); otherwise
  * *singular* (set = delete+insert) — ref `metamanager.cpp:101-104`,
  * `125-146`.
  *
  * Ids are deterministic UUIDv5-style hashes of (path, key, data,
  * mtime) rather than random UUIDv4 (ref uses a SQL trigger,
  * `database.cpp:80-89`) so that re-runs are reproducible and delta
  * computation stays content-addressed.
  */
object Meta {

  /** Key validation — ref `metamanager.cpp:30-45`. */
  def isValidKey(key: String): Boolean =
    key != null && key.nonEmpty && key.matches("[A-Za-z0-9_-]+")

  def isPlural(key: String): Boolean = key.endsWith("s")

  /** JSON validation with the reference's bare-string fallback
    * (`metamanager.cpp:81-99`): invalid JSON is accepted by re-quoting
    * as a JSON string. */
  def normalizeJson(data: String): String = {
    val t = data.trim
    // the reference PARSES (validateData, metamanager.cpp:80-98) and stores
    // json::parse(data).dump() — compact, object keys sorted — so valid JSON
    // is re-serialized through jsonText (dump-compatible: pretty-printed or
    // unsorted-key input persists in the same canonical form the reference
    // would produce); a parse failure retries with the input wrapped in bare
    // quotes (no escaping) and stores the PARSED value re-serialized — so
    // escape sequences in the raw text are interpreted exactly like
    // json::parse("\"..\"").dump(), and `{"ciao":}` still throws.
    val parsed: Option[Any] =
      if (t.isEmpty) None
      else try Some(MiniJson.parse(t))
      catch { case _: Exception => None }
    parsed match {
      case Some(v) => jsonText(v)
      case None =>
        val rescued =
          try Some(MiniJson.str(MiniJson.parse("\"" + data + "\"")))
          catch { case _: Exception => None }
        rescued match {
          case Some(s) => MiniJson.quote(s)
          case None => throw new IllegalArgumentException(s"Invalid JSON: $data")
        }
    }
  }

  def deterministicId(path: String, key: String, data: String, mtime: Long): String =
    java.util.UUID.nameUUIDFromBytes((path + "|" + key + "|" + data + "|" + mtime).getBytes("UTF-8")).toString

  def metaRow(path: String, key: String, data: String, mtime: Long): MetaRow = {
    val json = normalizeJson(data)
    MetaRow(deterministicId(path, key, json, mtime), path, key, json, mtime)
  }

  /** `add` — plural keys only (ref `metamanager.cpp:110-123`). */
  def add(meta: DataFrame, row: MetaRow)(implicit s: SparkSession): DataFrame = {
    require(isValidKey(row.key), s"invalid meta key: ${row.key}")
    require(isPlural(row.key), s"add requires a plural key (ending in 's'): ${row.key}")
    import s.implicits._
    meta.unionByName(Seq(row).toDF())
  }

  /** `set` — singular keys: delete existing (path, key) then insert
    * (ref `metamanager.cpp:125-146`). */
  def set(meta: DataFrame, row: MetaRow)(implicit s: SparkSession): DataFrame = {
    require(isValidKey(row.key), s"invalid meta key: ${row.key}")
    import s.implicits._
    meta
      .filter(!(col("path") === row.path && col("key") === row.key))
      .unionByName(Seq(row).toDF())
  }

  /** `remove` by id / `unset` by (path, key) — ref
    * `metamanager.cpp:148-196`. */
  def removeById(meta: DataFrame, id: String): DataFrame =
    meta.filter(col("id") =!= id)

  def unset(meta: DataFrame, path: String, key: String): DataFrame =
    meta.filter(!(col("path") === path && col("key") === key))

  /** `getString` — the (path, key) singular value as a bare string
    * with a default (ref `MetaManager::getString`, used for the STAC
    * collection license): the stored data is JSON, so a JSON string
    * unquotes and any other value renders as its JSON text. */
  def getString(meta: DataFrame, path: String, key: String, default: String): String = {
    val rows = meta
      .filter(col("path") === path && col("key") === key)
      .orderBy(col("mtime").desc)
      .select("data")
      .limit(1)
      .collect()
    rows.headOption.map(_.getString(0)).map { data =>
      try MiniJson.parse(data) match {
        case s: String => s
        case other => jsonText(other) // non-strings render as their JSON text (nlohmann dump)
      } catch { case _: Exception => data }
    }.getOrElse(default)
  }

  /** JSON text of a parsed MiniJson value — integral doubles print
    * without the .0, like nlohmann's dump of a JSON number. */
  private def jsonText(v: Any): String = v match {
    case null => "null"
    case b: Boolean => b.toString
    case l: Long => l.toString // integral literal preserved verbatim (int64 fidelity)
    case d: Double => if (d.isWhole && math.abs(d) < 1e15) d.toLong.toString else d.toString
    case s: String => MiniJson.quote(s)
    case m: Map[_, _] => // nlohmann's dump sorts object keys
      m.toSeq.sortBy(_._1.toString)
        .map { case (k, x) => MiniJson.quote(k.toString) + ":" + jsonText(x) }.mkString("{", ",", "}")
    case xs: Seq[_] => xs.map(jsonText).mkString("[", ",", "]")
    case other => String.valueOf(other)
  }

  /** `list` — GROUP BY path, key with counts — ref
    * `metamanager.cpp:198-218`. */
  def listKeys(meta: DataFrame): DataFrame =
    meta.groupBy("path", "key").agg(count(lit(1)).as("count")).orderBy("path", "key")

  /** Per-path meta JSON object — the correlated `json_group_object`
    * subquery of `dbops.cpp:944-958`: plural key → JSON array of
    * {id,data,mtime} rows, singular key → single JSON object. One
    * shuffle (groupBy path+key), then per-path map assembly. */
  def perPathJson(meta: DataFrame): DataFrame = {
    meta
      .groupBy(col("path"), col("key"))
      .agg(
        // stable order inside a group: by mtime then id, like a re-read of the ref DB
        array_join(
          transform(
            array_sort(collect_list(struct(col("mtime"), col("id"), col("data")))),
            x => concat(
              lit("{\"data\":"), x.getField("data"),
              lit(",\"id\":\""), x.getField("id"),
              lit("\",\"mtime\":"), x.getField("mtime"), lit("}")
            )
          ),
          ","
        ).as("joined"),
        count(lit(1)).as("n")
      )
      .withColumn(
        "kv",
        when(col("key").endsWith("s"), concat(lit("["), col("joined"), lit("]")))
          .otherwise(col("joined"))
      )
      .groupBy("path")
      .agg(
        concat(
          lit("{"),
          array_join(
            array_sort(collect_list(concat(lit("\""), col("key"), lit("\":"), col("kv")))),
            ","
          ),
          lit("}")
        ).as("meta")
      )
  }

  /** `dump` / `restore` with newest-mtime-wins merge — ref
    * `metamanager.cpp:265-335`. */
  def restore(current: DataFrame, incoming: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("path", "key", "id").orderBy(col("mtime").desc)
    current
      .unionByName(incoming)
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .drop("__rn")
  }
}
