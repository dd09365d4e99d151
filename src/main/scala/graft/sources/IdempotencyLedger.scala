package graft.sources

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path

/** Pending/complete operation ledger — the reference's DynamoDB
  * idempotency table (services/dynamodb_service.py:1,
  * services/idempotency_service.py:30: record the operation key as
  * in-progress before the write, mark complete after) re-expressed on
  * a filesystem every writer shares.
  *
  * A key transitions absent → pending → complete through two atomic
  * filesystem primitives: `create(overwrite = false)` (exactly one of N
  * concurrent claimers wins — this is what makes CONCURRENT writers
  * safe, where IdempotentSink's target-key anti-join alone only
  * serializes against already-committed data) and `rename` (the
  * pending→complete flip). A writer that crashes between write and
  * mark leaves a VISIBLE pending marker; `pendingKeys` is the recovery
  * surface — an operator checks the write landed and either `complete`s
  * or `abandon`s the claim. On HDFS both primitives are atomic; object
  * stores would back this with a conditional PUT, same contract.
  *
  * Completed markers expire: the reference's `mark_complete` writes a
  * DynamoDB `ttl` attribute (idempotency_service.py:75–103,
  * ttl_hours=24) so the table self-prunes; [[expireCompleted]] is that
  * sweep — without it the ledger grows without bound at ingest scale.
  *
  * `now` is injectable for deterministic TTL tests; production uses
  * the wall clock. */
class IdempotencyLedger(dir: String, conf: Configuration,
                        now: () => Long = () => System.currentTimeMillis) {

  private val base = new Path(dir)
  private val fs = base.getFileSystem(conf)
  fs.mkdirs(base)

  // reference keys look like "op:identifier" — ':' (and '/') are not
  // valid in a Hadoop Path segment, so marker names carry the key
  // percent-encoded (reversible, unlike a hash)
  private def enc(key: String): String =
    java.net.URLEncoder.encode(key, "UTF-8")
  private def dec(name: String): String =
    java.net.URLDecoder.decode(name, "UTF-8")

  private def marker(key: String, state: String) =
    new Path(base, s"${enc(key)}.$state")

  /** Claim a key for this writer: true iff THIS call created the
    * pending marker. False when the key is already complete, already
    * claimed, or the create lost a race (any IOException here means
    * "not acquired" — the safe direction: the caller simply does not
    * write, and the racing claimant proceeds).
    *
    * Atomicity of the decisive create: on HDFS `create(overwrite =
    * false)` is atomic server-side; on the LOCAL filesystem Hadoop's
    * implementation is check-then-create (two racing claimants can both
    * pass), so the `file:` scheme takes `File.createNewFile` — POSIX
    * O_CREAT|O_EXCL, atomic. An object-store deployment would back
    * this with a conditional PUT. */
  def begin(key: String): Boolean = {
    if (fs.exists(marker(key, "complete")) || fs.exists(marker(key, "pending"))) false
    else atomicCreate(marker(key, "pending"))
  }

  private def atomicCreate(p: Path): Boolean =
    if (fs.getScheme == "file")
      try new java.io.File(p.toUri.getPath).createNewFile()
      catch { case _: java.io.IOException => false }
    else
      try { fs.create(p, false).close(); true }
      catch { case _: java.io.IOException => false }

  /** Flip the claim to complete (atomic rename), stamped with the
    * COMPLETION time: rename preserves the claim-time mtime, but the
    * reference's TTL counts from mark_complete, so the marker is
    * re-timestamped after the flip. (A crash between rename and
    * setTimes leaves the claim-time mtime — TTL then fires EARLIER
    * than nominal, the safe direction: an expired key is merely
    * re-runnable, never wrongly skipped.) */
  def complete(key: String): Unit = {
    require(fs.rename(marker(key, "pending"), marker(key, "complete")),
      s"no pending claim to complete for '$key'")
    fs.setTimes(marker(key, "complete"), now(), -1)
  }

  /** Drop a pending claim whose write did NOT land (crash recovery). */
  def abandon(key: String): Unit =
    fs.delete(marker(key, "pending"), false): Unit

  def isComplete(key: String): Boolean = fs.exists(marker(key, "complete"))

  /** Claims whose writer never reported back — the recovery worklist. */
  def pendingKeys(): Seq[String] =
    if (!fs.exists(base)) Seq.empty
    else fs.listStatus(base).toSeq.map(_.getPath.getName)
      .filter(_.endsWith(".pending"))
      .map(n => dec(n.stripSuffix(".pending"))).sorted

  /** TTL sweep over COMPLETED markers (the DynamoDB ttl-attribute
    * analogue): markers completed more than `ttlMs` ago are deleted,
    * making their keys claimable again — the same observable behavior
    * as a DynamoDB item expiring. Pending markers are NEVER expired;
    * they are the crash-recovery worklist ([[recover]]), and expiring
    * one would let a second writer run while the first may still be
    * mid-write. One listStatus per sweep — O(markers) metadata, no
    * data reads. Returns the expired keys. */
  def expireCompleted(ttlMs: Long): Seq[String] = {
    val cutoff = now() - ttlMs
    if (!fs.exists(base)) Seq.empty
    else fs.listStatus(base).toSeq
      .filter(st => st.getPath.getName.endsWith(".complete") &&
        st.getModificationTime < cutoff)
      .map { st =>
        fs.delete(st.getPath, false)
        dec(st.getPath.getName.stripSuffix(".complete"))
      }.sorted
  }

  /** The reference's decorated-handler shape: skip if complete, claim,
    * run the write, mark complete; on failure release the claim and
    * rethrow. Returns true iff `write` ran to completion here. */
  def withOperation(key: String)(write: => Unit): Boolean = {
    if (!begin(key)) false
    else {
      try { write; complete(key); true }
      catch { case e: Throwable => abandon(key); throw e }
    }
  }

  /** Recovery pass over claims whose writer never reported back (a
    * crash between write and mark): `landed(key)` checks the actual
    * target (e.g. the operation's rows are present); landed claims are
    * marked complete — the write happened, only the mark was lost —
    * and the rest are abandoned so a retry can claim them. `keyFilter`
    * scopes the pass to one caller's keyspace — a shared ledger's
    * other operations keep their claims. Returns
    * (completed, abandoned). */
  def recover(landed: String => Boolean,
              keyFilter: String => Boolean = _ => true): (Seq[String], Seq[String]) = {
    val (ok, lost) = pendingKeys().filter(keyFilter).partition(landed)
    ok.foreach(complete)
    lost.foreach(abandon)
    (ok, lost)
  }
}
