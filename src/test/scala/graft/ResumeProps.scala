package graft

import java.sql.Timestamp

import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop, Properties, Test}
import org.scalacheck.Prop.propBoolean

import graft.cdc.Retention
import graft.ml.Vectors

/** Property checks for the consumer resume playbook: on arbitrary
  * feeds and arbitrary replay/checkpoint positions, every
  * (shard, iterator type) row must equal an independent plain-Scala
  * fold of the same semantics — TRIM_HORIZON serves exactly the
  * retained stream, AT_TIMESTAMP splits retained into at-or-after /
  * skipped and counts expired-after-the-point as lost, and
  * AFTER_SEQUENCE resumes strictly after the last at-or-before-
  * checkpoint sequence (never re-serving it).
  */
object ResumeProps extends Properties("graft.resume") {
  private lazy val spark = SparkTestSession.spark

  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(12)

  private val baseMs = Timestamp.valueOf("2024-06-01 00:00:00").getTime
  private val Span = 100000 // seconds (~28h, so a 12h horizon lands mid-feed)
  private val RetentionH = 12
  private val NShards = 8

  private def shardOf(pk: String): Long =
    Vectors.jvmPHash(pk) % NShards

  // events: (partition-key index 0..3, offset seconds); ids by index
  private val evGen: Gen[List[(Int, Int)]] =
    Gen.nonEmptyListOf(Gen.zip(Gen.chooseNum(0, 3), Gen.chooseNum(0, Span)))
  private val posGen: Gen[Int] = Gen.chooseNum(0, Span)

  property("every (shard, type) row equals the plain-Scala fold") =
    Prop.forAll(evGen, posGen, posGen) { (evs, atOff, cpOff) =>
      import spark.implicits._
      val rows = evs.zipWithIndex.map { case ((pki, off), id) =>
        (s"graft.users_$pki", new Timestamp(baseMs + off * 1000L), id.toLong)
      }
      val atTs = new Timestamp(baseMs + atOff * 1000L)
      val cpTs = new Timestamp(baseMs + cpOff * 1000L)
      val df = rows.toDF("partition_key", "ts", "event_id")
      val got = Retention.resumePlaybook(df, RetentionH,
          atTs.toString.stripSuffix(".0"), cpTs.toString.stripSuffix(".0"),
          NShards)
        .collect()
        .map(r => (r.getAs[Long]("shard"), r.getAs[String]("iterator_type")) ->
          (Option(r.getAs[Timestamp]("start_ts")).map(_.getTime),
            Option(r.get(r.fieldIndex("start_event_id")))
              .map(_.asInstanceOf[Long]),
            r.getAs[Long]("n_served"), r.getAs[Long]("n_skipped"),
            r.getAs[Long]("n_lost"), r.getAs[String]("verdict")))
        .toMap

      // independent fold
      val horizonMs = rows.map(_._2.getTime).max - RetentionH * 3600000L
      val expected = rows.groupBy(r => shardOf(r._1)).flatMap {
        case (shard, es) =>
          val ordered = es.sortBy(e => (e._2.getTime, e._3))
          val seqOf = ordered.zipWithIndex.map { case (e, i) =>
            e._3 -> (i + 1L) }.toMap
          val retained = ordered.filter(_._2.getTime >= horizonMs)
          def startOf(sel: ((String, Timestamp, Long)) => Boolean) = {
            val s = retained.filter(sel)
            (s.headOption.map(_._2.getTime), s.headOption.map(_._3))
          }
          def verdict(lost: Long) = if (lost == 0L) "ok" else "data-loss"
          val th = {
            val (sts, sid) = startOf(_ => true)
            (sts, sid, retained.size.toLong, 0L, 0L, "ok")
          }
          val at = {
            val served = retained.filter(_._2.getTime >= atTs.getTime)
            val lost = ordered.count(e => e._2.getTime < horizonMs &&
              e._2.getTime > atTs.getTime).toLong
            val (sts, sid) = startOf(_._2.getTime >= atTs.getTime)
            (sts, sid, served.size.toLong,
              (retained.size - served.size).toLong, lost, verdict(lost))
          }
          val as = {
            val cpSeq = ordered.filter(_._2.getTime <= cpTs.getTime)
              .map(e => seqOf(e._3)).maxOption
            def after(e: (String, Timestamp, Long)) =
              cpSeq.forall(seqOf(e._3) > _)
            val served = retained.filter(after)
            val lost = ordered.count(e =>
              e._2.getTime < horizonMs && after(e)).toLong
            val (sts, sid) = startOf(after)
            (sts, sid, served.size.toLong,
              (retained.size - served.size).toLong, lost, verdict(lost))
          }
          Seq((shard, "TRIM_HORIZON") -> th, (shard, "AT_TIMESTAMP") -> at,
            (shard, "AFTER_SEQUENCE") -> as)
      }.toMap

      (got == expected) :| s"got=$got\nexpected=$expected"
    }
}
