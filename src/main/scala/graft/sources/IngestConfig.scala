package graft.sources

/** Environment-validated ingestion config — the engine-side analogue of
  * the reference's startup config validation (config.py:26-47: required
  * env vars raise at load, optional credentials default to None) and
  * its credential-resolution chain (handler.py:30-55: secrets store
  * first when a secret name is configured, env user/pass next,
  * anonymous last with a warning — the API may work unauthenticated).
  *
  * Generic on purpose: `secretLookup` is injected (a () => Option[...]
  * the caller binds to whatever secret store they run), env comes in as
  * a Map so specs validate without mutating process state, and the
  * resolved credentials surface as extra HTTP headers for
  * [[PagedIngest.ingest]]'s `headers` hook — no provider-specific
  * names anywhere.
  */
final case class IngestConfig(
    apiUrl: String,
    stagingDir: String,
    secretName: Option[String],
    user: Option[String],
    pass: Option[String])

object IngestConfig {

  val ApiUrlKey = "GRAFT_INGEST_API_URL"
  val StagingKey = "GRAFT_INGEST_STAGING_DIR"
  val SecretNameKey = "GRAFT_INGEST_SECRET_NAME"
  val UserKey = "GRAFT_INGEST_USER"
  val PassKey = "GRAFT_INGEST_PASS"

  /** Fail-loudly validation: EVERY missing required key is reported in
    * one error (config.py raises per key; one aggregated message is the
    * operator-friendly variant of the same contract). Blank counts as
    * missing, mirroring the reference's falsy check. */
  def fromEnv(env: Map[String, String]): IngestConfig = {
    def get(k: String): Option[String] = env.get(k).map(_.trim).filter(_.nonEmpty)
    val missing = Seq(ApiUrlKey, StagingKey).filter(get(_).isEmpty)
    require(missing.isEmpty,
      s"missing required ingest config: ${missing.mkString(", ")}")
    IngestConfig(
      apiUrl = get(ApiUrlKey).get,
      stagingDir = get(StagingKey).get,
      secretName = get(SecretNameKey),
      user = get(UserKey),
      pass = get(PassKey))
  }

  /** Credential chain → header provider for [[PagedIngest.ingest]]:
    * secret store (when a secret name is configured and the lookup
    * yields a (user, pass)) > env user/pass > anonymous (empty map —
    * the reference logs a warning and proceeds unauthenticated,
    * handler.py:99-104). Resolution happens PER CALL, so rotated
    * credentials are picked up between fetch attempts — a 401 retried
    * after the secret rotates succeeds without restarting the run. */
  def credentialHeaders(
      config: IngestConfig,
      secretLookup: String => Option[(String, String)],
      warn: String => Unit = _ => ()): () => Map[String, String] = () => {
    val fromSecret = config.secretName.flatMap { name =>
      try secretLookup(name)
      catch {
        case scala.util.control.NonFatal(e) =>
          warn(s"secret lookup '$name' failed: ${e.getMessage}"); None
      }
    }
    val fromEnv = for (u <- config.user; p <- config.pass) yield (u, p)
    fromSecret.orElse(fromEnv) match {
      case Some((u, p)) =>
        val token = java.util.Base64.getEncoder
          .encodeToString(s"$u:$p".getBytes("UTF-8"))
        Map("Authorization" -> s"Basic $token")
      case None =>
        warn("no credentials resolved; proceeding unauthenticated")
        Map.empty
    }
  }
}
