package graft.enrich

import graft.model.Schemas
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** SURVEY §2 H — row-wise enrichment whose outputs land in the data model.
  * The external model call sits behind a trait with a deterministic local
  * stub (SURVEY §7 risk 5: without this no test can hash-match), and the
  * engine side is `mapPartitions` with API-shaped batching (100 texts per
  * call, reference: src/etl_pipeline.py:217) and in-partition retry
  * (3 attempts, exponential backoff — reference: src/embeddings.py:23-26).
  */
trait Embedder extends Serializable {
  def dim: Int
  /** Batch embed; must preserve order and return one vector per input.
    * Empty text → zero vector (reference: src/embeddings.py:29-31,78-88). */
  def embedBatch(texts: Seq[String]): Seq[Array[Float]]
}

/** Deterministic test/local embedder: sha256-seeded pseudo-vectors,
  * L2-normalized; identical text → identical vector on any JVM. */
final class HashEmbedder(val dim: Int = Schemas.EmbeddingDim) extends Embedder {
  override def embedBatch(texts: Seq[String]): Seq[Array[Float]] =
    texts.map { t =>
      if (t == null || t.isEmpty) Array.fill(dim)(0.0f)
      else {
        val seedBytes = java.security.MessageDigest.getInstance("SHA-256")
          .digest(t.getBytes("UTF-8"))
        val rnd = new java.util.Random(java.nio.ByteBuffer.wrap(seedBytes, 0, 8).getLong)
        val v = Array.fill(dim)(rnd.nextGaussian().toFloat)
        val norm = math.sqrt(v.map(x => x.toDouble * x.toDouble).sum)
        if (norm == 0.0) v else v.map(x => (x / norm).toFloat)
      }
    }
}

/** H2 result contract (reference: src/api/models.py:202-210). */
final case class CategoryResult(
    primary_category: String, subcategory: String, priority: String,
    action_required: Boolean, summary: String)

trait Categorizer extends Serializable {
  def categorize(subject: String, body: String): CategoryResult
}

/** Deterministic rule-based categorizer mirroring the reference's 8 fixed
  * categories (reference: src/llm_integration.py:76-92 prompt contract). */
final class StubCategorizer extends Categorizer {
  private val cats = Seq(
    "Work/Business" -> Seq("meeting", "project", "deadline", "report"),
    "Personal" -> Seq("family", "friend", "birthday"),
    "Financial" -> Seq("invoice", "payment", "bank", "receipt"),
    "Shopping" -> Seq("order", "shipped", "delivery", "cart"),
    "Travel" -> Seq("flight", "hotel", "booking", "itinerary"),
    "Newsletters" -> Seq("newsletter", "digest", "weekly"),
    "Spam/Promotional" -> Seq("offer", "discount", "free", "winner"),
    "Other" -> Seq())
  override def categorize(subject: String, body: String): CategoryResult = {
    val text = (Option(subject).getOrElse("") + " " +
      Option(body).getOrElse("").take(Schemas.CategorizeBodyChars)).toLowerCase
    val cat = cats.find { case (_, kws) => kws.exists(text.contains) }
      .map(_._1).getOrElse("Other")
    val priority =
      if (text.contains("urgent") || text.contains("asap")) "High"
      else if (cat == "Work/Business") "Medium" else "Low"
    CategoryResult(cat, "", priority,
      action_required = text.contains("please") || text.contains("action"),
      summary = Option(subject).getOrElse("").take(100))
  }
}

/** H4 action-item contract (reference: src/api/models.py:213-221). */
final case class ActionItem(
    description: String, responsible: String, due_date: String, priority: String)

trait ActionExtractor extends Serializable {
  /** Per email: subject + sender + date + body (≤3000 chars) → items
    * (reference: src/llm_integration.py:179-231). */
  def extract(subject: String, sender: String, date: String, body: String): Seq[ActionItem]
}

/** Deterministic rule-based extractor: imperative "please …" / "todo …" /
  * "action required …" sentences become items owned by the sender. */
final class StubActionExtractor extends ActionExtractor {
  private val triggers = Seq("please ", "todo", "action required", "must ", "need to ")
  override def extract(subject: String, sender: String, date: String, body: String): Seq[ActionItem] = {
    val text = Option(body).getOrElse("").take(graft.model.Schemas.ActionsBodyChars)
    text.split("[.!?\\n]+").toSeq
      .map(_.trim)
      .filter(s => s.nonEmpty && triggers.exists(s.toLowerCase.contains))
      .map(s => ActionItem(s.take(120), sender,
        due_date = "",
        priority = if (s.toLowerCase.contains("urgent")) "High" else "Medium"))
  }
}

/** H5 answer synthesis — external LLM in production, deterministic stub in
  * tests (reference: src/llm_integration.py:233-307). */
trait Answerer extends Serializable {
  def answer(question: String, contextBlocks: Seq[String]): String
}

final class StubAnswerer extends Answerer {
  override def answer(question: String, contextBlocks: Seq[String]): String =
    s"[stub] Q: $question — synthesized from ${contextBlocks.length} context emails."
}

object Enrichment {

  /** H1: batch embedding enrichment — embeds the B4 backlog in
    * `batchSize` groups inside each partition, with retry, and returns
    * (id, embedding) pairs ready for the A9 column-upsert.
    * (reference: src/etl_pipeline.py:196-231). */
  def embedBacklog(
      backlog: DataFrame,   // must have (id, embed_text)
      embedder: Embedder,
      batchSize: Int = Schemas.EmbeddingBatchSize,
      maxAttempts: Int = 3): DataFrame = {
    val spark = backlog.sparkSession
    import spark.implicits._
    val pairs: Dataset[(Long, String)] = backlog
      .select(col("id").cast("long"), coalesce(col("embed_text"), lit("")))
      .as[(Long, String)]
    pairs.mapPartitions { it =>
      it.grouped(batchSize).flatMap { batch =>
        val texts = batch.map(_._2)
        val vecs = retry(maxAttempts)(embedder.embedBatch(texts))
        batch.map(_._1).zip(vecs)
      }
    }.toDF("id", "embedding")
  }

  /** G4: bounded exponential-backoff retry (reference: src/embeddings.py:23-26 —
    * tenacity 3 attempts, exp 4-60 s; test-scaled base). */
  private[graft] def retry[A](attempts: Int, baseMs: Long = 50)(f: => A): A = {
    var n = 0
    var delay = baseMs
    while (true) {
      try return f
      catch {
        case e: Exception =>
          n += 1
          if (n >= attempts) throw e
          Thread.sleep(delay)
          delay = math.min(delay * 2, 60000)
      }
    }
    throw new IllegalStateException("unreachable")
  }

  /** H2: categorize a set of emails via a pluggable categorizer. */
  def categorize(emails: DataFrame, categorizer: Categorizer): DataFrame = {
    val spark = emails.sparkSession
    import spark.implicits._
    emails.select(col("id").cast("long"),
        coalesce(col("subject"), lit("")),
        coalesce(col("body_plain"), col("body_markdown"), lit("")))
      .as[(Long, String, String)]
      .map { case (id, subj, body) =>
        val r = categorizer.categorize(subj, body)
        (id, r.primary_category, r.priority, r.action_required, r.summary)
      }
      .toDF("id", "primary_category", "priority", "action_required", "summary")
  }

  /** H4: action-item extraction over a recent-email window; each item
    * tagged with its email id/subject/date and exploded to one row per
    * item (reference: src/llm_integration.py:179-231 — window 7d [1,90],
    * limit 50 [1,100]). */
  def extractActions(emails: DataFrame, extractor: ActionExtractor): DataFrame = {
    val spark = emails.sparkSession
    import spark.implicits._
    emails.select(col("id").cast("long"),
        coalesce(col("subject"), lit("")),
        coalesce(col("sender"), lit("")),
        coalesce(col("date").cast("string"), lit("")),
        coalesce(col("body_plain"), col("body_markdown"), lit("")))
      .as[(Long, String, String, String, String)]
      .flatMap { case (id, subj, sender, date, body) =>
        extractor.extract(subj, sender, date, body)
          .map(a => (id, subj, date, a.description, a.responsible, a.due_date, a.priority))
      }
      .toDF("email_id", "subject", "date", "description", "responsible",
        "due_date", "priority")
  }

  /** H3: thread context assembly — the engine part of thread
    * summarization: per-thread ordered context blocks + stats
    * (reference: src/llm_integration.py:116-177; per-email cap 500 chars). */
  def threadContext(emails: DataFrame): DataFrame =
    emails
      .withColumn("block",
        concat_ws("\n",
          concat(lit("From: "), coalesce(col("sender"), lit(""))),
          concat(lit("Date: "), col("date").cast("string")),
          concat(lit("Subject: "), coalesce(col("subject"), lit(""))),
          substring(coalesce(col("body_plain"), lit("")), 1, Schemas.ThreadSummaryChars)))
      .groupBy(col("thread_id"))
      .agg(
        count(lit(1)).as("email_count"),
        min(col("date")).as("first_date"),
        max(col("date")).as("last_date"),
        array_sort(collect_set(col("sender"))).as("participants"),
        concat_ws("\n---\n", sort_array(collect_list(
          struct(col("date"), col("block")))).getField("block")).as("context"))

  /** H5: RAG retrieval — top-k context blocks for a question; the LLM
    * answer synthesis stays a pluggable driver-side call
    * (reference: src/llm_integration.py:233-307; context cap 1000 chars,
    * k ∈ [1,20]). */
  def ragContext(searchHits: DataFrame): DataFrame =
    searchHits.withColumn("context_block",
      concat_ws("\n",
        concat(lit("Subject: "), coalesce(col("subject"), lit(""))),
        concat(lit("From: "), coalesce(col("sender"), lit(""))),
        concat(lit("Similarity: "), round(col("similarity"), 4).cast("string")),
        substring(coalesce(col("body_plain"), lit("")), 1, Schemas.RagContextChars)))
}
