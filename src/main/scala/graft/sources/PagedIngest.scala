package graft.sources

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path

/** Bounded-retry paged ingestion harness — the engine-side analogue of
  * the reference's REST ingest edge: `get_posts(per_page, page)`
  * fetches one page per call (services/invictus_api_service.py:35),
  * the orchestration pages through the feed, failures raise after the
  * transport's bounded retries, and each landed object passes an
  * idempotency check before the write
  * (handler.py:111 `get_invictus_post` → `dump_post_to_bucket`).
  *
  * Posture notes, not a transliteration:
  *
  *  - Ingestion is COORDINATOR work: one paged feed is inherently
  *    sequential (page N+1's existence is learned from page N), so
  *    this runs driver-side and lands raw pages into a staging dir the
  *    distributed engine then reads via [[JsonLines.read]]'s
  *    quarantine path. Parallelism at 100 TB comes from MANY feeds ×
  *    many staging dirs, not from racing one feed's pages.
  *  - `fetchPage` is injected ((page, perPage, headers) → one JSON
  *    object string per record; throws on transport failure). The
  *    HTTP client and JSON-array splitting live in the adapter —
  *    specs inject a fake server (the reference tests mock
  *    `requests.get` the same way, tests/test_services.py:174).
  *  - Auth is a `headers` PROVIDER, resolved before EVERY attempt
  *    (the reference resolves credentials per invocation,
  *    handler.py:30-55): an attempt rejected for stale credentials
  *    retries with freshly-resolved headers, so secret rotation
  *    mid-run heals inside the normal retry budget.
  *    [[IngestConfig.credentialHeaders]] builds the secrets-store >
  *    env > anonymous chain.
  *  - Retry is per page, bounded, with exponential backoff; the
  *    attempt that exhausts the budget rethrows (the reference wraps
  *    and raises, it never silently drops a page). `sleep` is
  *    injectable so specs assert the backoff schedule in zero time.
  *  - Idempotency is per page via [[IdempotencyLedger.withOperation]]
  *    (pending→write→complete, crash-safe): a re-run after a partial
  *    failure skips landed pages and fetches the rest — the
  *    reference's check/mark_complete bracket around the S3 put.
  *  - Recovery pre-pass: before paging, every PENDING claim of this
  *    dest (a previous run crashed between begin and complete) is
  *    resolved via [[IdempotencyLedger.recover]] against the actual
  *    page file — landed claims become complete, lost ones are
  *    abandoned so THIS run re-fetches the page. Without it a stale
  *    claim makes `withOperation` return false and the page would be
  *    counted "skipped" while never landing — silent data loss.
  *  - Termination: a short or empty page ends the feed (the REST
  *    convention the reference's per_page/page parameters imply),
  *    `maxPages` bounds a feed that never ends.
  *
  * The page file is written via temp + rename so a torn write is never
  * visible under the final name ([[IdempotentSink]]'s rationale). */
object PagedIngest {

  final case class IngestReport(
      pagesFetched: Int,    // pages this run landed
      pagesSkipped: Int,    // pages already complete in the ledger
      records: Long,        // records landed by this run
      retries: Int,         // failed attempts that were retried
      recovered: Int = 0,   // stale claims resolved by the pre-pass
      abandoned: Int = 0)   // stale claims released for re-fetch

  /** Headerless compatibility form — adapters that manage their own
    * auth. */
  def ingest(
      fetchPage: (Int, Int) => Seq[String],
      dest: String,
      conf: Configuration,
      ledger: IdempotencyLedger,
      perPage: Int = 100,
      maxPages: Int = 100000,
      maxRetries: Int = 3,
      backoffMs: Long = 1000L,
      sleep: Long => Unit = Thread.sleep): IngestReport =
    ingestAuth((p, pp, _) => fetchPage(p, pp), dest, conf, ledger,
      () => Map.empty, perPage, maxPages, maxRetries, backoffMs, sleep)

  def ingestAuth(
      fetchPage: (Int, Int, Map[String, String]) => Seq[String],
      dest: String,
      conf: Configuration,
      ledger: IdempotencyLedger,
      headers: () => Map[String, String],
      perPage: Int = 100,
      maxPages: Int = 100000,
      maxRetries: Int = 3,
      backoffMs: Long = 1000L,
      sleep: Long => Unit = Thread.sleep): IngestReport = {

    require(perPage > 0 && maxPages > 0 && maxRetries >= 0, "bounds must be positive")
    val base = new Path(dest)
    val fs = base.getFileSystem(conf)
    fs.mkdirs(base)

    val keyPrefix = s"paged_ingest:$dest:page="
    def pageFile(page: Int) = new Path(base, f"page-$page%05d.jsonl")

    // resolve THIS dest's stale pending claims before paging: claim
    // with a landed page file → complete; claim without → abandon so
    // the loop below re-fetches it (other dests' claims untouched)
    val (rec, aband) = ledger.recover(
      key => fs.exists(pageFile(key.stripPrefix(keyPrefix).toInt)),
      key => key.startsWith(keyPrefix))

    var fetched = 0
    var skipped = 0
    var records = 0L
    var retries = 0

    def fetchWithRetry(page: Int): Seq[String] = {
      var attempt = 0
      while (true) {
        // headers re-resolve per attempt: a stale-credential failure
        // retries with the current secret, not the one from attempt 1
        try return fetchPage(page, perPage, headers())
        catch {
          case scala.util.control.NonFatal(e) =>
            attempt += 1
            if (attempt > maxRetries) throw e
            retries += 1
            // exponential: backoff, 2*backoff, 4*backoff, ...
            sleep(backoffMs << (attempt - 1))
        }
      }
      throw new IllegalStateException("unreachable")
    }

    def land(page: Int, rows: Seq[String]): Unit = {
      val fin = new Path(base, f"page-$page%05d.jsonl")
      val tmp = new Path(base, f".page-$page%05d.jsonl.tmp")
      val out = fs.create(tmp, true)
      try rows.foreach { r => out.write((r + "\n").getBytes("UTF-8")) }
      finally out.close()
      if (!fs.rename(tmp, fin))
        throw new java.io.IOException(s"rename $tmp -> $fin failed")
    }

    var page = 1
    var done = false
    while (!done && page <= maxPages) {
      val key = s"paged_ingest:$dest:page=$page"
      if (ledger.isComplete(key)) {
        // already landed by a previous run — keep paging: the feed's
        // end is re-discovered from the first non-complete short page
        skipped += 1
        page += 1
      } else {
        val rows = fetchWithRetry(page)
        if (rows.isEmpty) done = true
        else {
          val claimed = ledger.withOperation(key) { land(page, rows) }
          if (claimed) { fetched += 1; records += rows.size }
          else skipped += 1 // lost a race / stale pending claim
          if (rows.size < perPage) done = true else page += 1
        }
      }
    }
    IngestReport(fetched, skipped, records, retries, rec.size, aband.size)
  }
}
