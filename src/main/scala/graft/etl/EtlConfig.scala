package graft.etl

/** Connector configuration (reference R1/R2, etl_connector.py:23-34):
  * env-style config with defaults and fail-fast validation.
  *
  * @param apiKey        required — fail fast when absent (R2,
  *                      etl_connector.py:33-34)
  * @param baseUrl       source base URL (etl_connector.py:26)
  * @param connectorName constant metadata column (etl_connector.py:30)
  * @param city          optional; empty string is treated as absent
  *                      (etl_connector.py:31,142)
  * @param perPage       server page size, pushed as a limit (R5)
  * @param maxPages      scan cap (etl_connector.py:88,96)
  * @param batchSize     sink batch size (etl_connector.py:206): bounds
  *                      rows per output file in the batch sink
  *                      (maxRecordsPerFile) and the flush cadence of
  *                      the streaming sink
  * @param maxRetries    transport retry attempts (etl_connector.py:53)
  * @param backoffMs     initial backoff, doubles per attempt
  *                      (etl_connector.py:55,62)
  */
final case class EtlConfig(
    apiKey: String,
    baseUrl: String = "https://otx.alienvault.com/api/v1",
    connectorName: String = "otx_pulses_connector",
    city: Option[String] = None,
    perPage: Int = 50,
    maxPages: Int = 100,
    batchSize: Int = 20,
    maxRetries: Int = 5,
    backoffMs: Long = 1000L) {
  require(apiKey.nonEmpty, "apiKey must be set (fail-fast, reference R2)")
}

object EtlConfig {
  /** Build from an env-style map with the reference's defaults;
    * missing/empty api key aborts (R2). Empty CITY → None (R12's
    * empty-string→null rule, etl_connector.py:142). */
  def fromEnv(env: Map[String, String]): EtlConfig = {
    val key = env.getOrElse("OTX_API_KEY", "")
    require(key.nonEmpty, "OTX_API_KEY missing — aborting (reference R2)")
    EtlConfig(
      apiKey = key,
      baseUrl = env.getOrElse("OTX_BASE_URL", "https://otx.alienvault.com/api/v1"),
      connectorName = env.getOrElse("CONNECTOR_NAME", "otx_pulses_connector"),
      city = env.get("CITY").filter(_.nonEmpty),
      perPage = env.getOrElse("PER_PAGE", "50").toInt,
      maxPages = env.getOrElse("MAX_PAGES", "100").toInt,
      batchSize = env.getOrElse("BATCH_SIZE", "20").toInt,
      maxRetries = env.getOrElse("MAX_RETRIES", "5").toInt,
      backoffMs = env.getOrElse("BACKOFF_MS", "1000").toLong)
  }
}
