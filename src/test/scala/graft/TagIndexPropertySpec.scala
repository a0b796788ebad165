package graft

import java.sql.Timestamp

import scala.util.Random

import graft.api.{ManifestIO, Mnemo}
import graft.api.Mnemo.RememberRequest
import org.apache.spark.sql.functions._

/** Model-based randomized check of the tag→bucket inverted index's
  * SAFETY invariant: after any interleaving of store mutations, a
  * `forgetSubject(tag)` must redact EVERY live row carrying the tag —
  * the index is allowed to over-approximate (fold a bucket the tag has
  * left), never to under-approximate (skip a bucket that holds it).
  * An under-approximation would be a silent GDPR-redaction miss, the
  * one failure mode the design documents as impossible
  * (api/Mnemo.scala commitWrite scaladoc).
  *
  * Seeded RNG → deterministic run; the op mix covers every index
  * write path: appends (remember), tag-adding bucket rewrites
  * (consolidate), non-tag-adding rewrites (forget/touch, which skip
  * the index job), and interleaved subject redactions. A driver-side
  * model of (id → tags, redacted) is the oracle. */
class TagIndexPropertySpec extends SparkSpec {

  private def ts(i: Int) = new Timestamp(1700000000000L + i * 60000L)

  test("randomized op interleavings: forgetSubject never misses a live tagged row; model agrees") {
    val rnd = new Random(20260813L)
    val tagPool = Vector("subject:a", "subject:b", "subject:c", "topic-x", "topic-y")

    (0 until 3).foreach { round =>
      val dir = java.nio.file.Files.createTempDirectory(s"tagprop$round").toFile
      dir.delete()
      val store = Mnemo.open(spark, dir.getAbsolutePath)
      // the model: id → (tags, redacted)
      var model = Map.empty[String, (Set[String], Boolean)]
      var nextId = 0

      def rememberBatch(): Unit = {
        val n = 1 + rnd.nextInt(12)
        val reqs = (0 until n).map { _ =>
          val id = f"r$round-m$nextId%04d"; nextId += 1
          val tags = tagPool.filter(_ => rnd.nextInt(3) == 0)
          model += id -> (tags.toSet, false)
          RememberRequest(id, "agent", s"t${rnd.nextInt(3)}",
            s"content $id", tags = tags, createdAt = ts(nextId))
        }
        store.remember(reqs)
      }
      def forgetSome(): Unit = {
        val live = model.keys.toSeq.sorted
        if (live.nonEmpty) {
          val ids = rnd.shuffle(live).take(1 + rnd.nextInt(3))
          store.forget("agent", ids, ts(9000 + nextId))
        }
      }
      def touchSome(): Unit = {
        val live = model.keys.toSeq.sorted
        if (live.nonEmpty) store.touch(rnd.shuffle(live).take(1 + rnd.nextInt(3)))
      }
      def consolidateNow(): Unit = {
        // flips __consolidated__ onto members via a bucket REPLACEMENT
        // (the addsTags index path) and appends a tagged bundle; the
        // bundle enters the model so later subject ops see it
        val r = store.consolidate("agent", minClusterSize = 2, ts(5000 + nextId))
        if (r.clustersFound > 0) {
          store.table().filter(col("id").startsWith("consol-"))
            .select("id", "tags").collect().foreach { row =>
              val id = row.getString(0)
              if (!model.contains(id))
                model += id -> (row.getSeq[String](1).toSet, false)
            }
        }
      }
      def forgetSubjectTag(tag: String): Unit = {
        store.forgetSubject(tag, ts(7000 + nextId))
        model = model.map { case (id, (tags, red)) =>
          id -> (tags, red || tags.contains(tag))
        }
        // THE invariant: no live unredacted row still carries the tag
        val missed = store.table()
          .filter(array_contains(col("tags"), tag) && !col("redacted"))
          .count()
        assert(missed == 0,
          s"round $round: forgetSubject('$tag') missed $missed live rows " +
            "— the inverted index under-approximated (redaction-safety bug)")
      }
      def forgetSubjectNow(): Unit =
        forgetSubjectTag(tagPool(rnd.nextInt(tagPool.size)))

      rememberBatch() // never start empty
      (0 until 14).foreach { _ =>
        rnd.nextInt(6) match {
          case 0 | 1 => rememberBatch()
          case 2 => forgetSome()
          case 3 => touchSome()
          case 4 => consolidateNow()
          case 5 => forgetSubjectNow()
        }
      }
      // end of sequence: redact every pool tag (deterministically, with
      // the invariant checked per tag) and compare the full redaction
      // state against the model
      tagPool.foreach(forgetSubjectTag)
      val got = store.table().select("id", "redacted").collect()
        .map(r => r.getString(0) -> r.getBoolean(1)).toMap
      val expected = model.map { case (id, (_, red)) => id -> red }
      // every modeled id exists with the modeled redaction state
      expected.foreach { case (id, red) =>
        assert(got.get(id).contains(red),
          s"round $round: id $id expected redacted=$red, got ${got.get(id)}")
      }
      // and the store holds nothing the model does not know about
      assert(got.keySet == expected.keySet,
        s"round $round: store/model id drift: ${got.keySet.diff(expected.keySet)} / ${expected.keySet.diff(got.keySet)}")
      // sanity: the manifest still carries a complete index
      assert(ManifestIO.read(store.path).exists(_.contains("tagidx")))
    }
  }
}
