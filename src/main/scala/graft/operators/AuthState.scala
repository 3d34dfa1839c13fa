package graft.operators

import scala.collection.mutable
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** AuthProfile state analysis operators (SURVEY.md §2.6).
  *
  * References:
  *  - StateAnalyze known-IP model: s/authprofile/AuthProfile.java:
  *    568-660 with s/authstate/AuthStateModel.java:241-430 — per
  *    identity, a persisted map of every source address previously
  *    authenticated from (with last-touch timestamp and location),
  *    pruned by entry age (PruningStrategyEntryAge.java:31-44);
  *    each event is classified known_ip / unknown_ip_within_geo /
  *    unknown_ip_outside_geo / unknown_ip_geo_failure.
  *  - CritObjectAnalyze: s/authprofile/CritObjectAnalyze.java:188-237
  *    — regex list over the normalized object, immediate critical
  *    alert keyed user_object_address.
  *  - AwsAssumeRoleCorrelator: s/authprofile/AwsAssumeRoleCorrelator
  *    .java:47-198 — pair the trusted- and trusting-account halves of
  *    a cross-account AssumeRole by sharedEventID inside a session
  *    gap, then rewrite the trusting event's subject user.
  *
  * Scale design: `stateAnalyze` uses the secondary-sort pattern
  * (repartition by identity + sortWithinPartitions + one streaming
  * per-partition scan) — O(live addresses per identity) memory, which
  * entry-age pruning bounds, and one shuffle total. The correlator is
  * a self-join on the shared-event key (both sides pre-filtered and
  * deduped before the exchange), not a group-and-scan, so Catalyst is
  * free to pick broadcast or shuffle sides at runtime.
  */
object AuthState {

  /** Classification outcomes (ref AuthProfile.java:318-340). */
  val KnownIp = "known_ip"
  val UnknownWithinGeo = "unknown_ip_within_geo"
  val UnknownOutsideGeo = "unknown_ip_outside_geo"
  /** GeoIP/minFraud resolution failed — here: no prior live entry to
    * compare against (ref UNKNOWN_IP_MINFRAUD_GEO_FAILURE). */
  val UnknownGeoFailure = "unknown_ip_geo_failure"
  /** New source on an anonymity network / hosting provider (minFraud
    * Insights flags) — these escalate BEFORE any geo comparison (ref
    * AuthProfile.java:663-690 else-if chain). */
  val UnknownAnonNetwork = "unknown_ip_anon_network"
  val UnknownHostingProvider = "unknown_ip_hosting_provider"

  /** Internal row shape for the state scan (public: Spark's encoder
    * codegen cannot construct private classes). lat/lon are optional:
    * events whose GeoIP resolution failed still classify (ref
    * UNKNOWN_IP_MINFRAUD_GEO_FAILURE — found by replaying the
    * reference's authprof_buffer2 fixture, whose 127.0.0.1 GCP-audit
    * event has no geo yet must alert). */
  case class Ev(key: String, tsUs: Long, seq: Long, addr: String,
      lat: Option[Double], lon: Option[Double],
      anon: Boolean = false, hosting: Boolean = false)

  /** Known-IP state analysis. Per identity `key`, events are scanned
    * in (ts, seq) order against a map of previously-seen source
    * addresses:
    *
    *  - an address already in the model (last touched within
    *    `pruneAgeSeconds`) classifies `known_ip`;
    *  - a new address is compared against the latest surviving model
    *    entry: distance above `maxKmStatic` ⇒
    *    `unknown_ip_outside_geo`, within ⇒ `unknown_ip_within_geo`,
    *    no surviving entry ⇒ `unknown_ip_geo_failure`.
    *
    * Every event refreshes its address entry (the reference's
    * updateEntry), and entries older than `pruneAgeSeconds` relative
    * to the current event are dropped (the batch analogue of the
    * wall-clock entry-age prune).
    *
    * `dedupeWindowSeconds`, when set, reproduces the reference's
    * per-window seenKnownAddresses skip: after an address classifies
    * known inside a window, further events from it in that window are
    * dropped entirely (no output, no state refresh).
    *
    * `namedSubnets` maps (name, cidr) — the reference's
    * IdentityManager named_subnets (getEntryKey, AuthProfile.java:
    * 632-635): addresses inside a named subnet share ONE model entry
    * under the subnet's name, so a login from a second office address
    * classifies known; v4 and v6 CIDRs both work. The emitted
    * `entry_key` is the subnet name when it differs from the raw
    * address (the reference's ENTRY_KEY metadata), else null.
    *
    * Geo-failure semantics (ref UNKNOWN_IP_MINFRAUD_GEO_FAILURE): a
    * NEW address classifies by distance only when BOTH the event and
    * the latest surviving model entry carry geo; either side missing
    * ⇒ `unknown_ip_geo_failure` — but known-ness itself never needs
    * geo.
    *
    * Output: (key, ts_ms, addr, action, km_centi, prev_addr,
    * entry_key) — the distance quantized to centi-km, null for
    * known/failure rows.
    */
  def stateAnalyze(df: DataFrame, ts: Column, seq: Column, key: Column,
      addr: Column, lat: Column, lon: Column,
      pruneAgeSeconds: Long, maxKmStatic: Double,
      dedupeWindowSeconds: Option[Long] = None,
      namedSubnets: Seq[(String, String)] = Nil,
      isAnonymous: Column = lit(false),
      isHostingProvider: Column = lit(false)): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val pruneUs = pruneAgeSeconds * 1000000L
    val dedupeUs = dedupeWindowSeconds.map(_ * 1000000L)
    val maxCenti = maxKmStatic * 100
    val subnets = namedSubnets // stable local for the closure
    val prepared = df
      .select(key.cast("string").as("key"), unix_micros(ts).as("tsUs"),
        seq.cast("long").as("seq"), addr.cast("string").as("addr"),
        lat.cast("double").as("lat"), lon.cast("double").as("lon"),
        coalesce(isAnonymous.cast("boolean"), lit(false)).as("anon"),
        coalesce(isHostingProvider.cast("boolean"), lit(false))
          .as("hosting"))
      .filter(col("key").isNotNull && col("addr").isNotNull)
      .repartition(col("key"))
      .sortWithinPartitions(col("key"), col("tsUs"), col("seq"))
      .as[Ev]
    prepared.mapPartitions { it =>
      def entryKeyOf(a: String): String =
        subnets.collectFirst {
          case (name, cidr) if graft.util.CidrUtil.cidrContainsAny(cidr, a) =>
            name
        }.getOrElse(a)
      var curKey: String = null
      // entryKey → (lastTouchUs, lastSeq, lat?, lon?); the compare
      // target is the latest-touched entry, ties broken by event seq
      // so the choice matches a (ts, seq)-ordered lag exactly
      val entries = mutable.HashMap
        .empty[String, (Long, Long, Option[Double], Option[Double])]
      val seenKnown = mutable.HashSet.empty[String]
      var seenWindow = Long.MinValue
      it.flatMap { e =>
        if (e.key != curKey) {
          curKey = e.key; entries.clear(); seenKnown.clear()
          seenWindow = Long.MinValue
        }
        val ek = entryKeyOf(e.addr)
        val ekOut = if (ek == e.addr) None else Some(ek)
        // entry-age prune relative to the current event
        entries.filterInPlace { case (_, (t, _, _, _)) => e.tsUs - t <= pruneUs }
        // per-window known-address skip (keyed on the raw address,
        // matching the reference's seenKnownAddresses list)
        val skip = dedupeUs match {
          case Some(wUs) =>
            val w = Math.floorDiv(e.tsUs, wUs)
            if (w != seenWindow) { seenWindow = w; seenKnown.clear() }
            seenKnown.contains(e.addr)
          case None => false
        }
        if (skip) None
        else if (entries.contains(ek)) {
          entries(ek) = (e.tsUs, e.seq, e.lat, e.lon)
          if (dedupeUs.isDefined) seenKnown += e.addr
          Some((e.key, e.tsUs / 1000, e.addr, KnownIp,
            None: Option[Long], None: Option[String], ekOut))
        } else {
          val prev = if (entries.isEmpty) None
            else Some(entries.maxBy { case (_, (t, sq, _, _)) => (t, sq) })
          entries(ek) = (e.tsUs, e.seq, e.lat, e.lon)
          // minFraud flags pre-empt geo analysis for a NEW source:
          // anonymity network first, then hosting provider (ref
          // AuthProfile.java:663-690 else-if chain)
          if (e.anon)
            Some((e.key, e.tsUs / 1000, e.addr, UnknownAnonNetwork,
              None: Option[Long], prev.map(_._1), ekOut))
          else if (e.hosting)
            Some((e.key, e.tsUs / 1000, e.addr, UnknownHostingProvider,
              None: Option[Long], prev.map(_._1), ekOut))
          else prev match {
            case None =>
              Some((e.key, e.tsUs / 1000, e.addr, UnknownGeoFailure,
                None: Option[Long], None: Option[String], ekOut))
            case Some((pAddr, (_, _, pLatO, pLonO))) =>
              (e.lat, e.lon, pLatO, pLonO) match {
                case (Some(la), Some(lo), Some(pLat), Some(pLon)) =>
                  val kmCenti = math.floor(graft.util.GeoUtil
                    .haversineKm(pLat, pLon, la, lo) * 100 + 0.5).toLong
                  val action = if (kmCenti > maxCenti) UnknownOutsideGeo
                    else UnknownWithinGeo
                  Some((e.key, e.tsUs / 1000, e.addr, action,
                    Some(kmCenti), Some(pAddr), ekOut))
                case _ => // either side lacks geo: failure action
                  Some((e.key, e.tsUs / 1000, e.addr, UnknownGeoFailure,
                    None: Option[Long], Some(pAddr), ekOut))
              }
          }
        }
      }
    }.toDF("key", "ts_ms", "addr", "action", "km_centi", "prev_addr",
      "entry_key")
  }

  /** Alternate critical-alert Slack escalation policy (ref
    * s/authprofile/CritObjectAnalyze.java:64-79 — the option string
    * `<tz>:<start_hour>:<end_hour>:<channel_id>`): alerts whose
    * timestamp, converted to `tz`, falls on a WEEKDAY with
    * hour-of-day in [hourStart, hourStop] (both inclusive) route to
    * the supplementary Slack channel INSTEAD of the direct-email
    * notification; all other alerts keep the email route and still
    * log to the channel. */
  case class CritEscalation(tz: String, hourStart: Int, hourStop: Int,
      channel: String) {
    require(hourStart >= 0 && hourStop <= 23 && hourStart <= hourStop)
  }

  /** CritObjectAnalyze: auth events whose acted-on object matches one
    * of the critical-object regexes alert immediately (severity
    * critical), keyed user_object_address for downstream suppression.
    * A single rlike over the alternation keeps the predicate inside
    * whole-stage codegen.
    *
    * With an escalation policy (ref CritObjectAnalyze.java:96-151),
    * the hour-of-day routing is a deterministic Column over the event
    * timestamp: `from_utc_timestamp` into the policy zone, then
    * hour + weekday predicates — `notify_email_direct` is nulled and
    * the channel-ping message selected when the policy window
    * matches; outside it the email route stays and the supplementary
    * message records where the notification went ("no one!
    * <!channel>" when no email is configured, like the reference).
    * `alertId` feeds the trailing "alert id:" line of both message
    * forms (pass a deterministic id for golden tests). */
  def critObjectAnalyze(df: DataFrame, ts: Column, user: Column,
      obj: Column, srcAddr: Column, critPatterns: Seq[String],
      city: Column = lit(null).cast("string"),
      country: Column = lit(null).cast("string"),
      critNotifyEmail: Option[String] = None,
      escalation: Option[CritEscalation] = None,
      alertId: Column = lit(null).cast("string")): DataFrame = {
    // the reference requires a full match per pattern — anchor the
    // alternation the same way Pattern.matches does
    val pat = critPatterns.map(p => s"(?:$p)").mkString("^(?:", "|", ")$")
    // ref buildAlertSummary (CritObjectAnalyze.java:153-166); absent
    // geo renders as "unknown" (createBaseAlert's default)
    val summary = concat(lit("critical authentication event observed "),
      user, lit(" to "), obj, lit(", "), srcAddr, lit(" ["),
      coalesce(city, lit("unknown")), lit("/"),
      coalesce(country, lit("unknown")), lit("]"))
    val emailCol = critNotifyEmail
      .map(e => lit(e)).getOrElse(lit(null)).cast("string")
    val (notifyEmail, slackChannel, slackMsg) = escalation match {
      case None =>
        (emailCol, lit(null).cast("string"), lit(null).cast("string"))
      case Some(p) =>
        val local = from_utc_timestamp(ts, p.tz)
        // reference weekday rule: ISO Saturday(6)/Sunday(7) excluded;
        // Spark dayofweek is 1=Sunday..7=Saturday
        val inPolicy = hour(local) >= p.hourStart &&
          hour(local) <= p.hourStop && !dayofweek(local).isin(1, 7)
        val idLine = concat(lit("\nalert id: "),
          coalesce(alertId, lit("")))
        val altMsg = concat(lit("<!channel> "), summary, idLine)
        val stdMsg = concat(summary,
          lit("\nNotification has been sent to " +
            critNotifyEmail.getOrElse("no one! <!channel>")), idLine)
        (when(inPolicy, lit(null).cast("string")).otherwise(emailCol),
          lit(p.channel).cast("string"),
          when(inPolicy, altMsg).otherwise(stdMsg))
    }
    df.filter(obj.isNotNull && obj.rlike(pat))
      .select(unix_millis(ts).as("ts_ms"), user.as("username"),
        obj.as("object"), srcAddr.as("sourceaddress"),
        lit("critical_object_analyze").as("subcategory"),
        lit("critical").as("severity"),
        concat_ws("_", user, obj, srcAddr).as("suppression_key"),
        summary.as("summary"),
        notifyEmail.as("notify_email_direct"),
        slackChannel.as("notify_slack_supplementary"),
        slackMsg.as("slack_supplementary_message"))
  }

  /** AwsAssumeRoleCorrelator: pair cross-account AssumeRole halves.
    *
    * Input rows must already be AssumeRole events carrying a shared
    * event id. The trusted half is the event NOT requiring subject
    * fixup whose role ARN targets a different account
    * (`isCrossAccount`); the trusting half requires fixup. Halves
    * pair on the shared event id when their timestamps fall within
    * `gapSeconds` (the reference's session gap), and the trusting
    * event is emitted with the trusted side's subject user.
    *
    * Both sides dedupe on (shared id, dedupe key) first — the
    * reference drops duplicate CloudTrail event ids inside a group.
    */
  def assumeRoleCorrelate(df: DataFrame, sharedEventId: Column,
      ts: Column, dedupeKey: Column, needsFixup: Column,
      isCrossAccount: Column, subjectUser: Column,
      gapSeconds: Long): DataFrame = {
    // earliest-wins dedupe: the reference's streaming state keeps the
    // FIRST event per (shared id, event id) — late re-deliveries of
    // the same event (awscorr4) must not shift the pairing timestamp,
    // and dropDuplicates' partition-order pick would be
    // nondeterministic here
    val base = df.select(sharedEventId.as("shared_id"),
        unix_micros(ts).as("ts_us"), dedupeKey.as("dk"),
        needsFixup.as("fixup"), isCrossAccount.as("cross"),
        subjectUser.as("user"))
      .filter(col("shared_id").isNotNull)
      .groupBy(col("shared_id"), col("dk"))
      .agg(min(struct(col("ts_us"), col("fixup"), col("cross"),
        col("user"))).as("r"))
      .select(col("shared_id"), col("r.ts_us").as("ts_us"), col("dk"),
        col("r.fixup").as("fixup"), col("r.cross").as("cross"),
        col("r.user").as("user"))
    val trusted = base.filter(!col("fixup") && col("cross"))
      .select(col("shared_id"), col("ts_us").as("trusted_ts_us"),
        col("user").as("trusted_user"))
    val trusting = base.filter(col("fixup"))
      .select(col("shared_id"), col("ts_us"), col("user"))
    trusting.join(trusted, Seq("shared_id"))
      .filter(abs(col("ts_us") - col("trusted_ts_us")) <=
        gapSeconds * 1000000L)
      .select(col("shared_id"), (col("ts_us") / 1000).cast("long")
        .as("ts_ms"), col("trusted_user").as("fixed_user"))
  }
}
