package graft.ingest

import graft.functions.EmailFunctions._
import graft.model.Schemas
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** A2 — raw provider message → canonical rows (reference:
  * src/providers/gmail/provider.py:227-342 `_parse_message` +
  * `_parse_payload`).
  *
  * The MIME tree (`payload.parts[]`, recursively nested) is flattened to
  * the schema-declared bound (`Schemas.mimeDepth`, 8 levels — Spark
  * schemas cannot be recursive, so the bound is declared once and the
  * walk derives from it), each level projected onto a common (partId,
  * mimeType, filename, body) struct so the arrays concatenate.
  * First-match-wins body selection and the filename⇒attachment rule
  * follow the reference exactly.
  *
  * Everything is declarative Column work — one narrow projection stage
  * over the raw scan, no UDFs, no driver loops; at 100 TB this is a
  * map-only stage with full predicate/column pushdown below it.
  */
object Normalize {

  /** Read raw fixture JSON (one message per line) with the declared schema. */
  def readRaw(spark: SparkSession, path: String): DataFrame =
    spark.read.schema(Schemas.rawMessageSchema).json(path)

  private def partStruct(p: Column): Column = struct(
    p.getField("partId").as("partId"),
    p.getField("mimeType").as("mimeType"),
    p.getField("filename").as("filename"),
    p.getField("body").as("body"))

  /** All MIME parts (payload itself + every nested level the schema
    * declares, [[graft.model.Schemas.mimeDepth]] deep) as one array.
    * Level k+1 is derived from level k's raw structs, stopping before the
    * schema's leaf level (which has no `parts` field); depth beyond real
    * nesting costs nothing — the arrays are empty from the first absent
    * level down. */
  def allParts(payload: Column): Column = {
    val level1 = coalesce(payload.getField("parts"), array())
    val rawLevels = Iterator.iterate(level1)(lvl =>
      flatten(filter(
        transform(lvl, p => coalesce(p.getField("parts"), array())),
        a => a.isNotNull)))
      .take(graft.model.Schemas.mimeDepth - 1).toSeq
    concat(array(partStruct(payload)) +: rawLevels.map(transform(_, partStruct(_))): _*)
  }

  /** First part matching a mime type that is body-like (no filename) and
    * has inline data — first-match-wins (reference: provider.py:303-329). */
  private def firstBodyData(parts: Column, mime: String): Column =
    get(
      filter(parts, p =>
        p.getField("mimeType") === mime &&
          (p.getField("filename").isNull || p.getField("filename") === "") &&
          p.getField("body").getField("data").isNotNull),
      lit(0)).getField("body").getField("data")

  /** Attachment-like parts: non-empty filename (reference: provider.py:331-339). */
  private def attachmentParts(parts: Column): Column =
    filter(parts, p =>
      p.getField("filename").isNotNull && p.getField("filename") =!= "")

  private def headerValue(payload: Column, name: String): Column =
    get(
      filter(coalesce(payload.getField("headers"), array()),
        h => lower(h.getField("name")) === name.toLowerCase),
      lit(0)).getField("value")

  /** Deterministic surrogate id from the natural key — stable across
    * re-runs and executors (unlike monotonically_increasing_id), which is
    * what makes the A4 merge idempotent. */
  def surrogateId(messageId: Column): Column = xxhash64(messageId)

  /** Canonical `emails` rows (minus embedding enrichment, which is a
    * separate A9 column-upsert pass). `now` is injected for deterministic
    * created_at/updated_at in tests. */
  def emails(raw: DataFrame, provider: String = "gmail",
      providerAccount: String = "default",
      now: java.sql.Timestamp = java.sql.Timestamp.from(java.time.Instant.EPOCH)): DataFrame = {
    val payload = col("payload")
    val parts = allParts(payload)
    val from = headerValue(payload, "From")
    val dateHdr = headerValue(payload, "Date")
    val bodyPlain = urlsafeB64Text(firstBodyData(parts, "text/plain"))
    val bodyHtml = urlsafeB64Text(firstBodyData(parts, "text/html"))
    raw
      .filter(col("id").isNotNull)
      .select(
        surrogateId(col("id")).as("id"),
        col("id").as("message_id"),
        col("threadId").as("thread_id"),
        headerValue(payload, "Subject").as("subject"),
        parseAddrEmail(from).as("sender"),
        parseAddrName(from).as("sender_name"),
        splitRecipients(headerValue(payload, "To")).as("recipients"),
        splitRecipients(headerValue(payload, "Cc")).as("cc_recipients"),
        splitRecipients(headerValue(payload, "Bcc")).as("bcc_recipients"),
        parseRfc2822(dateHdr).as("date"),
        bodyPlain.as("body_plain"),
        bodyHtml.as("body_html"),
        bodyMarkdown(bodyPlain, bodyHtml).as("body_markdown"),
        coalesce(col("labelIds"), array()).as("labels"),
        (size(attachmentParts(parts)) > 0).as("has_attachments"),
        lit(null).cast("array<float>").as("embedding"),
        lit(null).cast("string").as("markdown_path"),
        struct(
          col("snippet").as("snippet"),
          col("sizeEstimate").as("size_estimate"),
          col("historyId").as("history_id"),
          lit(provider).as("provider")).as("metadata"),
        lit(provider).as("provider"),
        lit(providerAccount).as("provider_account"),
        lit(now).as("created_at"),
        lit(now).as("updated_at"))
  }

  /** Canonical `attachments` rows with the F16 validation report applied
    * (reference: src/etl_pipeline.py:153-194 + src/security.py:57-110). */
  def attachments(raw: DataFrame): DataFrame = {
    val parts = allParts(col("payload"))
    val exploded = raw
      .filter(col("id").isNotNull)
      .select(
        col("id").as("message_id"),
        explode(attachmentParts(parts)).as("part"))
    val data = fromBase64(translate(col("part.body.data"), "-_", "+/"))
    val report = validationReport(col("part.filename"), col("part.mimeType"), data)
    exploded
      .select(
        xxhash64(concat_ws("|", col("message_id"),
          coalesce(col("part.partId"), lit("")))).as("id"),
        surrogateId(col("message_id")).as("email_id"),
        sanitizeFilename(col("part.filename")).as("filename"),
        col("part.mimeType").as("mime_type"),
        report.getField("size_bytes").as("size_bytes"),
        report.getField("content_hash").as("content_hash"),
        report.getField("is_safe").as("is_safe"),
        report.getField("scan_results").as("scan_results"),
        concat(col("message_id"), lit("/"),
          sanitizeFilename(col("part.filename"))).as("file_path"))
  }

  /** A8 audit rows for an import batch (reference: src/database.py:321-331,
    * src/etl_pipeline.py:146-149). */
  def auditRows(emailsDf: DataFrame, action: String,
      now: java.sql.Timestamp = java.sql.Timestamp.from(java.time.Instant.EPOCH)): DataFrame =
    emailsDf.select(
      xxhash64(concat_ws("|", col("message_id"), lit(action))).as("id"),
      col("id").as("email_id"),
      lit(action).as("action"),
      to_json(struct(col("message_id"), col("has_attachments"))).as("details"),
      col("provider").as("provider"),
      lit(now).as("created_at"))
}
