package graft.ingest

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import graft.model.{Label, Turn}

/** Deterministic, distributed synthetic transcript generator.
  *
  * Mirrors how the reference's edge-case corpus perturbs addresses
  * (reference: tests/edge_case_addresses.yaml — paraphrase / truncation /
  * punctuation noise), re-targeted at multi-turn conversations per
  * BASELINE.json `input_hint`. Pure function of (seed, conversation index):
  * generation runs as a typed flatMap over `spark.range(n)`, so it scales to
  * any size without driver materialisation and is identical at any
  * parallelism (the N-vs-4N scaling benchmark depends on that).
  *
  * Cluster structure: conversations come in groups of 4 consecutive ids
  * (base = id/4). Variant 0 is the canonical conversation; variants 1-3 are
  * duplicates perturbed as paraphrase / truncation+whitespace / punctuation+
  * casing noise. For ~1/3 of bases (hash-selected) only the canonical
  * exists, giving singleton clusters. Labels map every generated variant to
  * its canonical conv_id.
  */
object TranscriptGen extends Serializable {

  // -- deterministic PRNG primitives (splitmix64) ------------------------
  private def mix(z0: Long): Long = {
    var z = z0 + 0x9e3779b97f4a7c15L
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    z ^ (z >>> 31)
  }
  private def h(parts: Long*): Long = parts.foldLeft(0x51ab0e1fL)((a, b) => mix(a ^ mix(b)))
  private def pick(n: Int, parts: Long*): Int = {
    val v = h(parts: _*) % n
    (if (v < 0) v + n else v).toInt
  }

  // -- vocabulary --------------------------------------------------------
  // A small realistic word bank: common words (high TF) + a long tail of
  // rare "entity" tokens (low TF) so the salient-token / unusual-token
  // machinery (reference: cleaning/steps/term_frequencies.py:264-307) has
  // something to band.
  private val common: Array[String] = Array(
    "the", "a", "to", "of", "and", "is", "you", "can", "how", "do", "i",
    "my", "need", "help", "with", "please", "thanks", "it", "on", "for",
    "что", "как", "и", "не", "да", "het", "de", "een", "ik", "je")
  private val verbs: Array[String] = Array(
    "reset", "update", "install", "configure", "delete", "restart", "check",
    "enable", "disable", "export", "import", "merge", "deploy", "debug")
  private val nouns: Array[String] = Array(
    "password", "account", "server", "database", "cluster", "pipeline",
    "token", "billing", "invoice", "schedule", "report", "dashboard",
    "profile", "backup", "certificate", "webhook", "endpoint", "quota")
  // rare tail: ticket ids / hostnames — the "numeric_token"/"unusual token"
  // analogues for blocking (reference: cleaning/steps/tokenisation.py:22-36).
  private def rareToken(base: Long, slot: Int): String =
    s"TCK-${(math.abs(h(base, 7777L, slot)) % 100000)}"

  private val paraphrase: Map[String, String] = Map(
    "reset" -> "change", "update" -> "modify", "install" -> "setup",
    "check" -> "verify", "delete" -> "remove", "restart" -> "reboot",
    "help" -> "assist", "password" -> "passcode", "thanks" -> "thank you")

  private val tools = Array("search", "sql", "browser", "calculator", "files")

  /** All turns of one *canonical* conversation (before perturbation). */
  private def baseConv(seed: Long, base: Long): Vector[(String, String, Option[String])] = {
    val nTurns = 4 + pick(6, seed, base, 1L)
    (0 until nTurns).map { t =>
      val role = if (t % 2 == 0) "user" else if (pick(5, seed, base, t.toLong, 2L) == 0) "tool" else "assistant"
      val nWords = 5 + pick(9, seed, base, t.toLong, 3L)
      val words = (0 until nWords).map { w =>
        pick(10, seed, base, t.toLong, w.toLong, 4L) match {
          case 0 | 1 | 2 | 3 => common(pick(common.length, seed, base, t.toLong, w.toLong, 5L))
          case 4 | 5 | 6     => verbs(pick(verbs.length, seed, base, t.toLong, w.toLong, 6L))
          case 7 | 8         => nouns(pick(nouns.length, seed, base, t.toLong, w.toLong, 7L))
          case _             => rareToken(base, pick(3, seed, base, t.toLong, w.toLong, 8L))
        }
      }
      val tool = if (role == "tool") Some(tools(pick(tools.length, seed, base, t.toLong, 9L))) else None
      (role, words.mkString(" "), tool)
    }.toVector
  }

  /** Apply the variant-v perturbation to the canonical conversation. */
  private def perturb(seed: Long, base: Long, v: Int,
      conv: Vector[(String, String, Option[String])]): Vector[(String, String, Option[String])] =
    v match {
      case 0 => conv
      case 1 => // paraphrase: synonym-swap known words
        conv.map { case (r, t, tl) =>
          (r, t.split(" ").map(w => paraphrase.getOrElse(w, w)).mkString(" "), tl)
        }
      case 2 => // truncate last turn + whitespace noise
        val cut = if (conv.length > 2) conv.dropRight(1) else conv
        cut.zipWithIndex.map { case ((r, t, tl), i) =>
          val noisy = if (pick(2, seed, base, i.toLong, 11L) == 0) t.replace(" ", "  ") else t
          (r, noisy, tl)
        }
      case _ => // punctuation + casing noise
        conv.zipWithIndex.map { case ((r, t, tl), i) =>
          val words = t.split(" ").zipWithIndex.map { case (w, j) =>
            pick(6, seed, base, i.toLong, j.toLong, 12L) match {
              case 0 => w.capitalize
              case 1 => w + ","
              case _ => w
            }
          }
          (r, words.mkString(" ") + (if (pick(3, seed, base, i.toLong, 13L) == 0) "." else ""), tl)
        }
    }

  def convId(id: Long): String = f"c$id%010d"

  /** True iff conversation id exists (variant >0 of singleton bases don't). */
  private def exists(seed: Long, id: Long): Boolean = {
    val base = id / 4
    val v = (id % 4).toInt
    v == 0 || pick(3, seed, base, 14L) != 0
  }

  /** Generate the turn table for `nConvIds` conversation id slots.
    * Roughly 2/3 of bases yield 4-variant clusters; 1/3 singletons.
    */
  def turns(spark: SparkSession, nConvIds: Long, seed: Long = 42L): Dataset[Turn] = {
    import spark.implicits._
    val s = seed
    spark.range(nConvIds).as[Long].flatMap { id =>
      if (!exists(s, id)) Iterator.empty
      else {
        val base = id / 4
        val v = (id % 4).toInt
        val conv = perturb(s, base, v, baseConv(s, base))
        val cid = convId(id)
        conv.iterator.zipWithIndex.map { case ((role, text, tool), idx) =>
          Turn(cid, idx, role, text, tool,
            new Timestamp(1700000000000L + id * 100000L + idx * 1000L))
        }
      }
    }
  }

  /** Ground-truth labels: every existing conv -> its canonical (variant-0). */
  def labels(spark: SparkSession, nConvIds: Long, seed: Long = 42L): Dataset[Label] = {
    import spark.implicits._
    val s = seed
    spark.range(nConvIds).as[Long].flatMap { id =>
      if (!exists(s, id)) Iterator.empty
      else Iterator.single(Label(convId(id), convId((id / 4) * 4)))
    }
  }

  /** Convenience DataFrame form of `turns`. */
  def turnsDF(spark: SparkSession, nConvIds: Long, seed: Long = 42L): DataFrame =
    turns(spark, nConvIds, seed).toDF()
}
