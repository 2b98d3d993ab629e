package graft.ingest

import java.net.URI
import java.net.http.{HttpClient, HttpRequest, HttpResponse}
import java.time.Duration

/** S1–S4 — the paginated REST source (reference `etl/extract.py:44-167`,
  * `:299-344`). Driver-side fetch (the API is a single upstream; the
  * parallelism belongs downstream in Spark): raw page bodies are returned
  * as strings and parsed DISTRIBUTED via `spark.read.json` — the driver
  * never deserializes receipts.
  *
  * Contract mirrored from the reference:
  *   - `GET /receipts?updated_at_min&updated_at_max`, newest-first,
  *     `cursor` field chains pages via `GET /receipts?cursor=…`;
  *   - politeness delay between pages; optional debug receipt cap
  *     (reference hardcodes 150 at `extract.py:132`);
  *   - `GET /items` full refresh, never joined downstream (source parity);
  *   - incremental: `GET /receipts?limit=175&updated_at_min=…`, HTTP 402
  *     tolerated as an empty batch (`extract.py:338-341`).
  */
final class PosApiClient(
    baseUrl: String,
    apiKey: String,
    pageDelayMs: Long = 500,
    client: HttpClient = HttpClient.newBuilder()
      .connectTimeout(Duration.ofSeconds(30)).build()) {

  private def get(url: String): HttpResponse[String] = {
    val req = HttpRequest.newBuilder(URI.create(url))
      .header("Authorization", s"Bearer $apiKey")
      .GET().build()
    client.send(req, HttpResponse.BodyHandlers.ofString())
  }

  private def raiseForStatus(r: HttpResponse[String], url: String): HttpResponse[String] = {
    if (r.statusCode() >= 400)
      throw new RuntimeException(s"HTTP ${r.statusCode()} from $url")
    r
  }

  private val cursorRe = "\"cursor\"\\s*:\\s*\"?([A-Za-z0-9_\\-]+)\"?".r
  private val receiptKeyRe = "\"receipt_number\"".r

  private[ingest] def extractCursor(body: String): Option[String] =
    cursorRe.findFirstMatchIn(body).map(_.group(1)).filter(c => c != "null")

  /** Receipt count per page without a driver-side JSON parse:
    * `receipt_number` appears exactly once per receipt (top level only).
    */
  private[ingest] def countReceipts(body: String): Int =
    receiptKeyRe.findAllMatchIn(body).length

  /** `GET /items` → raw envelope body. */
  def fetchItems(): String = {
    val url = s"$baseUrl/items"
    raiseForStatus(get(url), url).body()
  }

  /** S1/S2 — bounded-range paginated fetch → raw page bodies (in fetch
    * order, newest first). `receiptCap=Some(150)` reproduces the debug
    * halt; `None` is the full backfill (S2).
    */
  def fetchReceiptPages(
      updatedAtMin: String,
      updatedAtMax: String,
      receiptCap: Option[Int] = None): Seq[String] = {
    val pages = Seq.newBuilder[String]
    var url: Option[String] =
      Some(s"$baseUrl/receipts?updated_at_min=$updatedAtMin&updated_at_max=$updatedAtMax")
    var total = 0
    while (url.isDefined) {
      val body = raiseForStatus(get(url.get), url.get).body()
      val n = countReceipts(body)
      if (n == 0) url = None
      else {
        pages += body
        total += n
        if (receiptCap.exists(total >= _)) url = None
        else
          extractCursor(body) match {
            case Some(c) =>
              url = Some(s"$baseUrl/receipts?cursor=$c")
              if (pageDelayMs > 0) Thread.sleep(pageDelayMs) // politeness
            case None => url = None
          }
      }
    }
    pages.result()
  }

  /** S3 — single-page incremental fetch; 402 → empty batch (the API's
    * rate-limit contract).
    */
  def fetchIncremental(lastTimestamp: String, limit: Int = 175): Option[String] = {
    val url = s"$baseUrl/receipts?limit=$limit&updated_at_min=$lastTimestamp"
    val r = get(url)
    if (r.statusCode() == 402) None
    else Some(raiseForStatus(r, url).body())
  }
}
