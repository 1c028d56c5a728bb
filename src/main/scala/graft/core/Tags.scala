package graft.core

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Registry tag parsing — the RELATIONAL face of `registryutils.cpp`
  * (`parseTag`, :30-110): `[registry/]organization/dataset` tag strings
  * normalize to (registry_url, organization, dataset) with the
  * reference's exact rules — trim + lowercase, trailing-slash strip,
  * rightmost-split extraction, component validation
  * (`^[a-z0-9][a-z0-9_-]{1,128}$`), scheme defaulting, path drop, and
  * default-port stripping. A relational engine FLAGS invalid tags
  * (valid = false, null outputs) where the CLI throws; everything else
  * is the same function. The HTTP client the parsed registry feeds
  * stays out of scope with the transport family.
  */
object Tags {

  /** ref `constants.h:10` */
  val DefaultRegistry = "hub.dronedb.app"

  /** ref `registryutils.cpp:18` — 2..129 chars, lowercase/digit start. */
  val ComponentPattern = "^[a-z0-9][a-z0-9_-]{1,128}$"

  /** Parse a tag column → struct(registry_url, organization, dataset,
    * valid). */
  def parseTag(tag: Column, insecure: Boolean = false): Column = {
    val defScheme = if (insecure) "http" else "https"
    val t = regexp_replace(lower(trim(tag)), "/+$", "")
    val hasSlash = instr(t, "/") > 0
    val ds = regexp_extract(t, "([^/]*)$", 1)
    val beforeDs = substring(t, lit(1), greatest(length(t) - length(ds) - 1, lit(0)))
    val org = regexp_extract(beforeDs, "([^/]*)$", 1)
    val reg = substring(beforeDs, lit(1), greatest(length(beforeDs) - length(org) - 1, lit(0)))
    val orgHasProto = org.startsWith("http://") || org.startsWith("https://")
    val valid = hasSlash &&
      org.rlike(ComponentPattern) && ds.rlike(ComponentPattern) && !orgHasProto
    // registry URL: default when absent; otherwise scheme-default, strip
    // any path, strip the scheme's default port
    val scheme = when(reg.startsWith("https://"), "https")
      .when(reg.startsWith("http://"), "http")
      .otherwise(defScheme)
    val hostPort = substring_index(regexp_replace(reg, "^https?://", ""), "/", 1)
    val noDefaultPort = when(scheme === "http", regexp_replace(hostPort, ":80$", ""))
      .otherwise(regexp_replace(hostPort, ":443$", ""))
    val url = when(reg === "" || reg.isNull, concat(lit(defScheme + "://"), lit(DefaultRegistry)))
      .otherwise(concat(scheme, lit("://"), noDefaultPort))
    struct(
      when(valid, url).as("registry_url"),
      when(valid, org).as("organization"),
      when(valid, ds).as("dataset"),
      valid.as("valid")
    )
  }

  /** Salted password hash — `passwordmanager.cpp:34-35`
    * (`Hash::strSHA256(salt + password)`). Salt GENERATION stays with
    * the CLI (randomness); the engine provides the hash + verify
    * relational faces. */
  def saltedHash(salt: Column, password: Column): Column =
    sha2(concat(salt, password), 256)

  /** ◆ Password verification — `passwordmanager.cpp:53-77`: a
    * candidate is accepted if ANY stored (salt, hash) row matches
    * `sha256(salt || candidate)`, with the reference's special case
    * that an EMPTY candidate is accepted when no passwords are stored
    * at all (`verify()`'s `noPasswords` branch). The stored table is
    * tiny — the reference literally loops over every row — so the
    * verify join is a broadcast left nested loop per candidate batch,
    * never a shuffle; LEFT so candidates survive an empty password
    * table with accepted=0 instead of vanishing. */
  def verifyPasswords(candidates: DataFrame, candCol: String, passwords: DataFrame): DataFrame = {
    val pw = passwords.select(col("salt"), col("hash"))
    val noPasswords = pw.isEmpty // driver-side probe of a tiny table
    candidates
      .join(broadcast(pw), lit(true), "left")
      .groupBy(candidates.columns.map(col): _*)
      .agg(
        greatest(
          max(when(saltedHash(col("salt"), col(candCol)) === col("hash"), 1L).otherwise(0L)),
          when(lit(noPasswords) && length(col(candCol)) === 0, 1L).otherwise(0L)
        ).as("accepted")
      )
  }

  def passwordQuery(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val docs = Tables.documents(s, dir)
    val pw = docs
      .filter($"doc_id" < 50)
      .select(
        substring(md5(concat(lit("salt"), $"doc_id".cast("string"))), 1, 8).as("salt"),
        $"doc_id".as("pid")
      )
      .select($"salt", saltedHash($"salt", concat(lit("pw"), $"pid".cast("string"))).as("hash"))
    val cand = docs
      .filter($"doc_id" < 100)
      .select(
        $"doc_id".as("cid"),
        when($"doc_id" % 3 === 0, concat(lit("pw"), $"doc_id".cast("string")))
          .otherwise(concat(lit("wrong"), $"doc_id".cast("string")))
          .as("pw")
      )
    verifyPasswords(cand, "pw", pw).select($"cid", $"accepted").orderBy($"cid")
  }

  /** ◆ Tag parsing under the oracle: deterministic tag strings derived
    * from doc ids cover the default-registry, bare-host, full-URL-with-
    * port, trailing-slash, and invalid-component cases; DuckDB
    * re-derives every field with the same string ops. */
  def tagParseQuery(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val tag = when($"doc_id" % 5 === 0, concat(lit("Org"), $"doc_id", lit("/ds-"), $"doc_id"))
      .when($"doc_id" % 5 === 1, concat(lit("reg"), $"doc_id" % 3, lit(".example.com/org_"), $"doc_id", lit("/ds"), $"doc_id"))
      .when($"doc_id" % 5 === 2, concat(lit("https://reg.example.com:8443/org"), $"doc_id", lit("/ds"), $"doc_id", lit("/")))
      .when($"doc_id" % 5 === 3, concat(lit("http://plain.example.com:80/org"), $"doc_id", lit("/ds"), $"doc_id"))
      .otherwise(concat(lit("BAD!org/"), $"doc_id")) // invalid: bad char + 1-char-ish ds
    Tables
      .documents(s, dir)
      .select($"doc_id", parseTag(tag).as("p"))
      .select($"doc_id", $"p.registry_url", $"p.organization", $"p.dataset", $"p.valid")
  }
}
