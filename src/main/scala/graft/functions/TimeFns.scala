package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Time/window helpers mirroring the reference's date handling.
  *
  * The reference stamps every DWS row with tumbling-window bounds as
  * `yyyy-MM-dd HH:mm:ss` strings (`DateFormatUtil.java:17-54`, which
  * hard-codes UTC+8; we use the session time zone — pinned UTC by the
  * harness) and computes 10-second event-time tumbling windows
  * everywhere (e.g. `DwsTradeOrderWindow.java:172`).
  *
  * `stt`/`edt` format the bounds of Spark's native `window()` struct,
  * which aligns to the epoch with no offset — the arithmetic twin
  * DuckDB replicates is `floor(epoch/len)*len` (spelled inline in the
  * oracle SQL).
  */
object TimeFns {
  val FMT = "yyyy-MM-dd HH:mm:ss"

  /** Window bound → `yyyy-MM-dd HH:mm:ss` string (reference `stt`). */
  def stt(windowCol: Column): Column = date_format(windowCol.getField("start"), FMT)

  /** Window bound → string (reference `edt`). */
  def edt(windowCol: Column): Column = date_format(windowCol.getField("end"), FMT)

  /** `yyyy-MM-dd` partition date, reference `toDate`/`str.split(" ")[0]`
    * (`DwsTradePaymentSucWindow.java:149`). */
  def toDateStr(ts: Column): Column = date_format(ts, "yyyy-MM-dd")
}
