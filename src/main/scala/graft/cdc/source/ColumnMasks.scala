package graft.cdc.source

import org.apache.spark.unsafe.types.UTF8String

import java.nio.charset.StandardCharsets
import java.security.MessageDigest

/**
 * Capture-time column transforms — the reference's Debezium passthrough
 * masking options (`DebeziumOptions.java:24-41` forwards every
 * `debezium.`-prefixed option; Debezium's RelationalDatabaseConnectorConfig
 * grammar, applied before records ever leave the connector):
 *
 *   debezium.column.mask.with.<n>.chars        = col[,col…]
 *   debezium.column.truncate.to.<n>.chars      = col[,col…]
 *   debezium.column.mask.hash.<algo>.with.salt.<salt> = col[,col…]
 *   debezium.column.mask.hash.v2.<algo>.with.salt.<salt> = col[,col…]
 *
 * The v2 variant is accepted with the same salted-digest semantics as v1:
 * upstream, v2 only pins the charset/byte-order handling that v1 left
 * driver-dependent, and this re-expression always digests
 * UTF-8(salt) ++ UTF-8(value) — i.e. it already implements the v2
 * contract, for both spellings.
 *
 * Masked/truncated/hashed values replace the original STRING payload value
 * in every emitted image (snapshot rows, and before/after of every change
 * event), so downstream state, sinks and checkpoints never see the
 * original — PII scrubbing at ingest, like `scan.exclude-columns` but
 * value-preserving in shape.
 *
 * Rules ride to executors as one compact spec string on each input
 * partition (same transport as the partition's schema DDL).
 */
object ColumnMasks {
  sealed trait Rule extends Serializable {
    def apply(v: UTF8String): UTF8String
  }

  /** Replace the value with `n` `*` characters (constant-width redaction). */
  final case class MaskWith(n: Int) extends Rule {
    private val stars = "*" * n
    def apply(v: UTF8String): UTF8String = UTF8String.fromString(stars)
  }

  /** Keep only the first `n` characters. */
  final case class TruncateTo(n: Int) extends Rule {
    def apply(v: UTF8String): UTF8String = v.substringSQL(1, n)
  }

  /** Lower-hex digest of salt+value — pseudonymization that preserves
    * equality (same input, same salt → same token), Debezium's
    * `column.mask.hash.<algo>.with.salt.<salt>` semantic. */
  final case class HashWithSalt(algo: String, salt: String) extends Rule {
    def apply(v: UTF8String): UTF8String = {
      // per-call getInstance: MessageDigest instances are stateful and the
      // reader may be shared across tasks; the JDK caches the provider
      val md = MessageDigest.getInstance(algo)
      md.update(salt.getBytes(StandardCharsets.UTF_8))
      md.update(v.getBytes)
      val d = md.digest()
      val sb = new java.lang.StringBuilder(d.length * 2)
      d.foreach(b => sb.append(f"${b & 0xff}%02x"))
      UTF8String.fromString(sb.toString)
    }
  }

  // fixed grammar tokens match case-insensitively; the salt capture is
  // case-PRESERVED (it is user text embedded in the option key)
  private val MaskRe = """(?i:column\.mask\.with\.)(\d+)(?i:\.chars)""".r
  private val TruncRe = """(?i:column\.truncate\.to\.)(\d+)(?i:\.chars)""".r
  private val HashRe =
    """(?i:column\.mask\.hash\.)([A-Za-z0-9-]+)(?i:\.with\.salt\.)(.+)""".r
  // the algo capture cannot span a '.', so the v2 segment needs its own
  // alternative — without it a valid upstream option fell to fail-loud
  private val HashV2Re =
    """(?i:column\.mask\.hash\.v2\.)([A-Za-z0-9-]+)(?i:\.with\.salt\.)(.+)""".r

  /** Known digest names accepted by the hash rule (validated up front so a
    * typo fails at analysis, not per-row on an executor). */
  private val Algos = Map("md5" -> "MD5", "sha-1" -> "SHA-1",
    "sha-256" -> "SHA-256")

  /** Parse every `debezium.column.*` option (prefix already stripped) into
    * column → rule. A column may appear in at most one rule. */
  def fromOptions(debeziumOpts: Map[String, String]): Map[String, Rule] = {
    val entries = debeziumOpts.toSeq.flatMap { case (key, cols) =>
      val rule = key match {
        case MaskRe(n) => Some(MaskWith(n.toInt))
        case TruncRe(n) => Some(TruncateTo(n.toInt))
        // v2 FIRST: HashRe's algo capture would otherwise be tried (and
        // fail on the '.') for v2-spelled keys
        case HashV2Re(algo, salt) =>
          val jdk = Algos.getOrElse(algo.toLowerCase,
            throw new IllegalArgumentException(
              s"unsupported mask hash algorithm '$algo' — " +
                s"expected one of ${Algos.keys.mkString("|")}"))
          require(!salt.contains(RS) && !salt.contains(US),
            "mask salt must not contain tab or unit-separator characters")
          Some(HashWithSalt(jdk, salt): Rule)
        case HashRe(algo, salt) =>
          val jdk = Algos.getOrElse(algo.toLowerCase,
            throw new IllegalArgumentException(
              s"unsupported mask hash algorithm '$algo' — " +
                s"expected one of ${Algos.keys.mkString("|")}"))
          // delimiters of the wire encoding must fail HERE (analysis), not
          // as a cryptic "bad mask spec" inside an executor's decode
          require(!salt.contains(RS) && !salt.contains(US),
            "mask salt must not contain tab or unit-separator characters")
          Some(HashWithSalt(jdk, salt): Rule)
        case k if k.toLowerCase.startsWith("column.mask.") ||
            k.toLowerCase.startsWith("column.truncate.") =>
          // a MALFORMED masking rule is a privacy hazard if ignored —
          // reject; other column.* Debezium options (propagate.source.type,
          // exclude.list, ...) are accepted and ignored like every other
          // debezium.* passthrough key
          throw new IllegalArgumentException(
            s"unrecognized debezium column mask option 'debezium.$k'")
        case _ => None // other debezium.* passthrough options: ignored
      }
      rule.toSeq.flatMap(r =>
        cols.split(",").map(_.trim).filter(_.nonEmpty).map { c =>
          // same fail-at-analysis guarantee as the salt check: a
          // delimiter in a COLUMN NAME would otherwise surface as a
          // per-task "bad mask spec" during the scan
          require(!c.contains(RS) && !c.contains(US),
            s"masked column name must not contain tab or unit-separator " +
              s"characters: '$c'")
          c -> r
        })
    }
    val dup = entries.groupBy(_._1).filter(_._2.size > 1).keys
    require(dup.isEmpty,
      s"column(s) named by more than one mask rule: ${dup.mkString(",")}")
    entries.toMap
  }

  // record separator between rules, unit separator between fields — neither
  // occurs in column names or sane salts
  private final val RS = "\t"
  private final val US = "\u001f"

  /** Compact wire form for partition transport. */
  def encode(rules: Map[String, Rule]): String =
    rules.toSeq.sortBy(_._1).map { case (c, r) =>
      r match {
        case MaskWith(n) => Seq(c, "m", n.toString).mkString(US)
        case TruncateTo(n) => Seq(c, "t", n.toString).mkString(US)
        case HashWithSalt(a, s) => Seq(c, "h", a, s).mkString(US)
      }
    }.mkString(RS)

  def decode(spec: String): Map[String, Rule] =
    if (spec == null || spec.isEmpty) Map.empty
    else spec.split(RS).map { ent =>
      ent.split(US, -1) match {
        case Array(c, "m", n) => c -> (MaskWith(n.toInt): Rule)
        case Array(c, "t", n) => c -> (TruncateTo(n.toInt): Rule)
        case Array(c, "h", a, s) => c -> (HashWithSalt(a, s): Rule)
        case _ => throw new IllegalArgumentException(s"bad mask spec: $ent")
      }
    }.toMap
}
