package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** PII masking / pseudonymization Column functions for training-data
  * curation — the scrubbing pass every web-scale corpus runs before
  * anything else touches it.
  *
  * All pure `regexp_replace`/`md5` Column functions: codegen'd, row-local,
  * zero shuffle — the masking pass rides the same scan as ingestion.
  * Patterns are RE2-safe (no lookahead/backreferences) so the exact same
  * pattern runs in other engines for verification.
  */
object PrivacyFns {

  /** Mask email addresses. */
  def maskEmail(text: Column, repl: String = "[EMAIL]"): Column =
    regexp_replace(text,
      lit("[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"), lit(repl))

  /** Mask North-American-style phone numbers (optionally +1, separators
    * space/dot/dash, optional parens around the area code). */
  def maskPhone(text: Column, repl: String = "[PHONE]"): Column =
    regexp_replace(text,
      lit("(\\+?1[ .-]?)?(\\([0-9]{3}\\)|[0-9]{3})[ .-]?[0-9]{3}[ .-]?[0-9]{4}"),
      lit(repl))

  /** Mask dotted-quad IPv4 addresses. */
  def maskIpv4(text: Column, repl: String = "[IP]"): Column =
    regexp_replace(text,
      lit("\\b([0-9]{1,3}\\.){3}[0-9]{1,3}\\b"), lit(repl))

  /** Mask runs of `minRun`+ digits — account numbers, SSN-ish ids,
    * numeric user ids embedded in names/urls. */
  def maskDigitRuns(text: Column, minRun: Int = 6, repl: String = "[ID]"): Column =
    regexp_replace(text, lit(s"[0-9]{$minRun,}"), lit(repl))

  /** How many digit runs [[maskDigitRuns]] would mask. */
  def digitRunCount(text: Column, minRun: Int = 6): Column =
    size(regexp_extract_all(text, lit(s"[0-9]{$minRun,}"), lit(0))).cast(LongType)

  /** Deterministic pseudonym: a stable 12-hex surrogate for a direct
    * identifier. Same input → same pseudonym across runs, partitions and
    * engines (md5 is portable), so joins on the pseudonym still work
    * after scrubbing. For real deployments use a KEYED hash (HMAC) so the
    * mapping can't be brute-forced from the id space. */
  def pseudonym(idText: Column): Column = substring(md5(idText), 1, 12)
}
