package graft.core

/** Typed output rows — the reference's 13 Lombok beans (`J/bean/<name>.java`,
  * FIXTURES.md §1.5) as Scala case classes. `Dataset[T]` +
  * `Encoders.product` replace the reflection row-binder
  * (`MyClickHouseUtil.java:29-52`): encoders bind columns natively and
  * `@TransientSink` fields become an explicit drop list at the sink
  * (`graft.sinks.Sinks.batchSink`).
  *
  * All window rows carry `stt`/`edt` bound strings and a wall-clock
  * `ts` (excluded from oracle comparison, SURVEY §7.4).
  */
object Beans {

  /** `TrafficPageViewBean.java:12-38` (A1 output). */
  case class TrafficPageView(stt: String, edt: String, vc: String, ch: String,
      ar: String, isNew: String, uvCt: Long, svCt: Long, pvCt: Long,
      durSum: Long, ujCt: Long, ts: Long)

  /** `KeywordBean.java:14-34` (A6 output). */
  case class Keyword(stt: String, edt: String, keyword: String,
      keywordCount: Long, ts: Long)

  /** `TradeProvinceOrderWindowBean.java:17-44` (A3 output);
    * `orderIdSet` was `@TransientSink` — it lives only in agg state. */
  case class TradeProvinceOrderWindow(stt: String, edt: String,
      provinceId: String, provinceName: String, orderCount: Long,
      orderAmount: Double, ts: Long)

  /** `TradeUserSpuOrderBean.java` (A2 output). */
  case class TradeUserSpuOrder(stt: String, edt: String, userId: String,
      spuId: String, spuName: String, trademarkId: String,
      trademarkName: String, category1Id: String, category1Name: String,
      category2Id: String, category2Name: String, category3Id: String,
      category3Name: String, orderCount: Long, orderAmount: Double, ts: Long)

  /** `TradePaymentWindowBean.java` (A5 payment output). */
  case class TradePaymentWindow(stt: String, edt: String,
      paymentSucUniqueUserCount: Long, paymentSucNewUserCount: Long, ts: Long)

  /** `TradeOrderBean.java` (A5 order output). */
  case class TradeOrder(stt: String, edt: String, orderUniqueUserCount: Long,
      orderNewUserCount: Long, orderActivityReduceAmount: Double,
      orderCouponReduceAmount: Double, orderOriginalTotalAmount: Double, ts: Long)

  /** `CartAddUuBean.java` (A5 cart output). */
  case class CartAddUu(stt: String, edt: String, cartAddUuCt: Long, ts: Long)

  /** `TrafficHomeDetailPageViewBean.java` (A5 home/detail output). */
  case class TrafficHomeDetailPageView(stt: String, edt: String,
      homeUvCt: Long, goodDetailUvCt: Long, ts: Long)

  /** `UserRegisterBean.java` (A5 register output). */
  case class UserRegister(stt: String, edt: String, registerCt: Long, ts: Long)

  /** `UserLoginBean.java` (A5/A9 login output incl. 7-day win-back). */
  case class UserLogin(stt: String, edt: String, backCt: Long, uuCt: Long,
      ts: Long)

  /** `TradeTrademarkCategoryUserRefundBean.java` (A4 output). */
  case class TradeTrademarkCategoryUserRefund(stt: String, edt: String,
      trademarkId: String, trademarkName: String, category3Id: String,
      category3Name: String, userId: String, refundCount: Long, ts: Long)

  /** `TableProcess.java:11-22` (DIM config row). */
  case class TableProcess(sourceTable: String, sinkTable: String,
      sinkColumns: String, sinkPk: String, sinkExtend: String)

  /** `WaterSensor.java:9-14` (join-test bean). */
  case class WaterSensor(id: String, ts: Long, vc: Int)
}
