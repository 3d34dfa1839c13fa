package graft.parse

import java.time.Instant
import java.util.UUID
import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
import org.apache.spark.sql.{Dataset, SparkSession}
import graft.model.{Event, Normalized, NormalizedType}
import graft.util.TimeUtil

/** Log parser: schemaless text → typed Event (SURVEY.md §2.2).
  *
  * Mirrors the reference's two-phase model (ref s/parser/Parser.java:
  * 507-564): a 2-stage envelope strip (Stackdriver LogEntry → Mozlog)
  * followed by an ordered probe over payload matchers, each guarded by
  * a cheap substring fast-matcher so no JSON work happens for
  * non-matching formats. Unknown input never throws — it falls through
  * to the RAW payload (ref s/parser/Raw.java:11).
  *
  * Spark-first execution: `parse` is a single `mapPartitions` with one
  * lazily-created Jackson ObjectMapper per partition (the mapper is
  * not serializable and must live executor-side, same pattern as the
  * reference's per-worker parser instance). Upstream of the parse, use
  * `fastFilter` — a Column substring predicate — so the scan prunes
  * obviously-irrelevant lines before the opaque parser runs (manual
  * predicate pushdown; Catalyst cannot see into mapPartitions).
  */
object Parser {

  /** Envelope + pre-parsed JSON context handed to payload matchers. */
  final case class ParseCtx(
      raw: String,
      json: Option[JsonNode],
      timestamp: Option[Instant],
      project: Option[String],
      labels: Map[String, String],
      mozlogHostname: Option[String],
      mozlogType: Option[String],
      mozlogLogger: Option[String] = None)

  trait PayloadMatcher extends Serializable {
    def name: String
    /** Substring guards: a candidate line must contain at least one
      * (empty = match anything). One source of truth for BOTH the
      * per-line `fastMatch` probe and the column-level `fastFilter`
      * pushdown, so the two can never drift apart. */
    def fastKeywords: Seq[String]
    /** Cheap substring guard — must be true for parse to be probed. */
    final def fastMatch(line: String): Boolean =
      fastKeywords.isEmpty || fastKeywords.exists(line.contains)
    def parse(ctx: ParseCtx): Option[Event]
  }

  /** Stackdriver HTTP(S) LB request entry (ref s/parser/GLB.java). */
  object GlbMatcher extends PayloadMatcher {
    val name = "glb"
    val fastKeywords = Seq("http_load_balancer", "httpRequest")
    def parse(ctx: ParseCtx): Option[Event] = ctx.json.flatMap { root =>
      val req = root.path("httpRequest")
      if (req.isMissingNode || !req.has("requestUrl")) None
      else {
        val url = req.path("requestUrl").asText(null)
        val (host, path) = splitUrl(url)
        Some(mkEvent(ctx, name, Normalized(
          types = Seq(NormalizedType.HttpRequest),
          sourceAddress = strOpt(req, "remoteIp"),
          requestMethod = strOpt(req, "requestMethod"),
          requestUrl = Option(url),
          urlRequestPath = path,
          urlRequestHost = host,
          requestStatus = intOpt(req, "status"),
          userAgent = strOpt(req, "userAgent")),
          fields = Map.empty))
      }
    }
  }

  /** Nginx access log as Stackdriver jsonPayload (ref s/parser/Nginx.java). */
  object NginxMatcher extends PayloadMatcher {
    val name = "nginx"
    val fastKeywords = Seq("\"remote_addr\"", "\"remote_ip\"")
    def parse(ctx: ParseCtx): Option[Event] = ctx.json.flatMap { root =>
      val p = if (root.has("jsonPayload")) root.path("jsonPayload") else root
      // the reference accepts TWO Stackdriver nginx shapes (ref
      // Nginx.java:41-55): variant 1 (GCP stdout native:
      // remote_addr/status/user_agent) and variant 2 (EC2:
      // remote_ip/code/agent, "-" as the null address)
      val v1 = p.has("remote_addr") && p.has("request")
      val v2 = p.has("remote_ip") && p.has("referrer") &&
        p.has("req_time") && p.has("agent") && p.has("request")
      if (!v1 && !v2) None
      else {
        val request = p.path("request").asText("")
        val parts = request.split(" ", 3)
        val (method, url) =
          if (parts.length >= 2) (Some(parts(0)), Some(parts(1))) else (None, None)
        val (host, path) = url.map(splitUrl).getOrElse((None, None))
        val addr = (if (v1) strOpt(p, "remote_addr") else strOpt(p, "remote_ip"))
          .filter(_ != "-")
        // XFF + pipeline-proxy marker ride along so pipelines can
        // re-select the client with the reference's useXffAsRemote /
        // useProxyXff semantics (ref Nginx.java:216-229 +
        // Parser.applyProxyXFFAddressSelector:211-238;
        // Functions.proxyXffClientAddress is the Column form)
        val xff = Map.empty[String, String] ++
          strOpt(p, "x_forwarded_for").filter(_.nonEmpty)
            .map("x_forwarded_for" -> _) ++
          strOpt(p, "x_pipeline_proxy")
            .filter(v => v.nonEmpty && v != "-")
            .map("x_pipeline_proxy" -> _)
        Some(mkEvent(ctx, name, Normalized(
          types = Seq(NormalizedType.HttpRequest),
          sourceAddress = addr,
          requestMethod = method,
          requestUrl = url,
          urlRequestPath = path,
          urlRequestHost = host,
          requestStatus = if (v1) intOpt(p, "status") else intOpt(p, "code"),
          userAgent = strOpt(p, if (v1) "user_agent" else "agent")),
          fields = xff))
      }
    }
  }

  /** OpenSSH syslog auth line (ref s/parser/OpenSSH.java:110). The
    * syslog preamble's hostname becomes the acted-on object (ref
    * OpenSSH.java setObject — the reference's auth summaries read
    * "… to emit-bastion"; found replaying authprof_buffer1). */
  object OpenSshMatcher extends PayloadMatcher {
    val name = "openssh"
    private val re =
      """(?:^\S+ +\d+ \S+ (\S+) sshd\[\d+\]: |.*sshd\[\d+\]: |^)(Accepted|Failed) (\S+) for (?:invalid user )?(\S+) from (\S+) port (\d+).*""".r
    val fastKeywords = Seq("sshd")
    def parse(ctx: ParseCtx): Option[Event] = {
      val msg = ctx.json.map(j =>
        if (j.has("textPayload")) j.path("textPayload").asText("") else ctx.raw)
        .getOrElse(ctx.raw)
      msg match {
        case re(host, outcome, authMethod, user, addr, _) =>
          Some(mkEvent(ctx, name, Normalized(
            types = Seq(NormalizedType.Auth),
            subjectUser = Some(user),
            sourceAddress = Some(addr),
            objectValue = Option(host)), // null when no syslog preamble
            fields = Map("outcome" -> outcome, "auth_method" -> authMethod)))
        case _ => None
      }
    }
  }

  /** Apache combined log format (ref s/parser/ApacheCombined.java:184). */
  object ApacheCombinedMatcher extends PayloadMatcher {
    val name = "apache_combined"
    private val re =
      """^(\S+) \S+ (\S+) \[([^\]]+)\] "(\S+) (\S+)[^"]*" (\d{3}) (\S+) "([^"]*)" "([^"]*)".*""".r
    val fastKeywords = Seq("\" ")
    def parse(ctx: ParseCtx): Option[Event] = ctx.raw match {
      case re(addr, user, ts, method, path, status, _, _, ua) =>
        val t = parseApacheTs(ts).orElse(ctx.timestamp)
        Some(mkEvent(ctx.copy(timestamp = t), name, Normalized(
          types = Seq(NormalizedType.HttpRequest),
          sourceAddress = Some(addr),
          subjectUser = if (user == "-") None else Some(user),
          requestMethod = Some(method),
          requestUrl = Some(path),
          urlRequestPath = Some(path),
          requestStatus = Some(status.toInt),
          userAgent = if (ua.isEmpty) None else Some(ua)),
          fields = Map.empty))
      case _ => None
    }
  }

  /** CloudTrail-style JSON auth record (ref s/parser/Cloudtrail.java:
    * 309 — Jackson field extraction + AUTH normalization). SwitchRole
    * console events take the subject user from the SwitchFrom ARN's
    * `user/` resource when present (ref Cloudtrail.java:153-172 — the
    * switching user, not the assumed-role identity), and the acted-on
    * object is the recipient account id (ref :86; friendly-name
    * translation via the identity manager's aws_account_map is a
    * downstream Column transform, [[graft.operators.Identity
    * .mapAwsAccount]]). */
  object CloudtrailMatcher extends PayloadMatcher {
    val name = "cloudtrail"
    val fastKeywords = Seq("userIdentity")
    def parse(ctx: ParseCtx): Option[Event] = ctx.json.flatMap { root =>
      val r = if (root.has("jsonPayload")) root.path("jsonPayload") else root
      if (!r.has("userIdentity") || !r.has("eventName")) None
      else {
        val ident = r.path("userIdentity")
        val eventName = r.path("eventName").asText("")
        val identType = ident.path("type").asText("")
        val noError = !r.hasNonNull("errorCode")
        val isSwitchRole = eventName == "SwitchRole" &&
          r.path("eventType").asText("") == "AwsConsoleSignIn" &&
          r.path("responseElements").path("SwitchRole")
            .asText("") == "Success"
        // the reference's isAuthEvent gate (ref Cloudtrail.java:175-209):
        // console login success, IAMUser session-token/assume-role, the
        // cross-account AssumeRole half (AWSAccount identity, fixed up
        // by the correlator), or a successful SwitchRole — NOT service
        // calls (AWSService AssumeRole stays un-normalized, which is
        // what keeps autoscaling role assumptions out of the
        // crit-object path, TestAwsAssumeRoleCorrelator awscorr3)
        val isAuth = isSwitchRole ||
          (eventName == "ConsoleLogin" &&
            r.path("eventType").asText("") == "AwsConsoleSignIn" &&
            r.path("responseElements").path("ConsoleLogin")
              .asText("") == "Success") ||
          (eventName == "GetSessionToken" && identType == "IAMUser" &&
            noError) ||
          (eventName == "AssumeRole" &&
            (identType == "IAMUser" || identType == "AWSAccount") &&
            noError)
        val switchFromUser =
          if (!isSwitchRole) None
          else {
            // arn:aws:iam::<account>:user/<name> — only the user
            // resource type overrides the identity (ref :160-168)
            val parts = r.path("additionalEventData").path("SwitchFrom")
              .asText("").split(":", 6)
            if (parts.length == 6 && parts(5).startsWith("user/"))
              Some(parts(5).substring("user/".length))
            else None
          }
        val user = switchFromUser
          .orElse(strOpt(ident, "userName"))
          .orElse(strOpt(ident, "arn"))
        val ts = strOpt(r, "eventTime").flatMap(TimeUtil.parseIso8601)
          .orElse(ctx.timestamp)
        Some(mkEvent(ctx.copy(timestamp = ts), name, Normalized(
          types = if (isAuth) Seq(NormalizedType.Auth) else Seq.empty,
          subjectUser = user,
          sourceAddress = strOpt(r, "sourceIPAddress"),
          objectValue =
            if (isAuth) strOpt(r, "recipientAccountId") else None),
          fields = Map(
            "event_name" -> r.path("eventName").asText(""),
            "event_source" -> r.path("eventSource").asText(""),
            // awsbehavior matcher surface (ref s/awsbehavior/
            // CloudtrailMatcher.java:59-76)
            "recipient_account_id" -> r.path("recipientAccountId").asText(""),
            "invoked_by" -> ident.path("invokedBy").asText(""),
            "mfa_authenticated" -> ident.path("sessionContext")
              .path("attributes").path("mfaAuthenticated").asText(""),
            "request_username" -> r.path("requestParameters")
              .path("userName").asText(""),
            "shared_event_id" -> r.path("sharedEventID").asText(""),
            "event_id" -> r.path("eventID").asText(""),
            // assume-role correlation surface (ref s/authprofile/
            // AwsAssumeRoleCorrelator.java: trusting half lacks a
            // userName; cross-account = roleArn account differs from
            // the caller's account)
            "identity_type" -> ident.path("type").asText(""),
            "identity_account_id" -> ident.path("accountId").asText(""),
            "request_role_arn" -> r.path("requestParameters")
              .path("roleArn").asText(""))))
      }
    }
  }

  /** FxA auth-server event (ref s/parser/FxaAuth.java:426-464 — mozlog
    * envelope, request-level path/method/status/errno fields, XFF-style
    * selection over the JSON-encoded remoteAddressChain, and the
    * discern* event-summary classification chain, AUTH_SESSION
    * normalization). */
  object FxaAuthMatcher extends PayloadMatcher {
    val name = "fxaauth"
    val fastKeywords = Seq("fxa-auth")

    // FxA errno values the classifier keys on
    // (ref s/parser/models/fxaauth/FxaAuth.java:22-42)
    private val AccountUnknown = 102
    private val IncorrectPassword = 103
    private val InvalidVerificationCode = 105
    private val RequestBlocked = 125

    /** path+method+status(+errno) → event summary string, mirroring
      * the discernEventSummary probe order (ref FxaAuth.java:373-415).
      * Returns None for unclassified requests and for requests the
      * auth server already blocked (errno 125). */
    private[parse] def summarize(path: String, method: String,
        status: Int, errno: Option[Int]): Option[String] = {
      val m = method.toLowerCase
      val postOrGet = m == "post" || m == "get"
      if (errno.contains(RequestBlocked)) None
      else if (path == "/v1/account/login" && status == 400 &&
        (errno.contains(IncorrectPassword) || errno.contains(AccountUnknown)))
        Some("loginFailure")
      else if (path == "/v1/account/status" && status == 200 && postOrGet)
        Some("accountStatusCheckSuccess")
      else if (path == "/v1/recovery_email/verify_code" && status == 400 &&
        m == "post" && (errno.contains(InvalidVerificationCode) ||
          errno.contains(AccountUnknown)))
        Some("recoveryEmailVerifyCodeFailure")
      else if (path == "/v1/recovery_email" && status == 200 && m == "post")
        Some("sendRecoveryEmailSuccess")
      else if (path == "/v1/sms" && status == 200 && m == "post")
        Some("sendSmsConnectDeviceSuccess")
      else if (path == "/v1/account/create" && status == 200 && m == "post")
        Some("accountCreateSuccess")
      else if (path == "/v1/account/login" && status == 200 && m == "post")
        Some("loginSuccess")
      else if (path == "/v1/password/forgot/send_code" && m == "post" &&
        status == 200)
        Some("passwordForgotSendCodeSuccess")
      else if (path == "/v1/password/forgot/send_code" && m == "post" &&
        status == 400)
        Some("passwordForgotSendCodeFailure")
      else if (path == "/v1/certificate/sign" && status == 200 && m == "post")
        Some("certificateSignSuccess")
      else if (path == "/v1/session/verify_code" && status == 200 && m == "post")
        Some("sessionVerifyCodeSuccess")
      else if (path == "/v1/account/status" && status == 429 && postOrGet)
        Some("accountStatusCheckBlocked")
      else None
    }

    /** remoteAddressChain is a JSON-encoded array of addresses; select
      * the client the way the reference's XFF selector does with no
      * trusted-proxy config: the last element when several are present
      * (ref s/parser/Parser.java:164-193). */
    private def selectAddress(f: JsonNode): Option[String] =
      strOpt(f, "remoteAddressChain").flatMap { rac =>
        val trimmed = rac.trim
        if (trimmed.startsWith("[")) {
          // cheap parse of a flat JSON string array — no mapper needed
          val parts = trimmed.stripPrefix("[").stripSuffix("]")
            .split(",").iterator
            .map(_.trim.stripPrefix("\"").stripSuffix("\""))
            .filter(_.nonEmpty).toArray
          if (parts.nonEmpty) Some(parts.last) else None
        } else Some(trimmed)
      }.orElse(strOpt(f, "sourceaddress"))

    def parse(ctx: ParseCtx): Option[Event] = {
      // Real auth-server records carry Logger "fxa-auth-server" with
      // Type "request.summary" (ref FxaAuth.java:123-146 keys on the
      // logger); a bare Type of "fxa-auth" is also accepted.
      val isFxa = ctx.mozlogLogger.contains("fxa-auth-server") ||
        ctx.mozlogType.contains("fxa-auth")
      if (!isFxa) None
      else ctx.json.map { f =>
        val path = strOpt(f, "path")
        val method = strOpt(f, "method")
        val status = intOpt(f, "status")
        val errno = intOpt(f, "errno")
        val summary = for {
          p <- path; m <- method; s <- status
          es <- summarize(p, m, s, errno)
        } yield es
        Some(mkEvent(ctx, name, Normalized(
          types = Seq(NormalizedType.AuthSession),
          subjectUser = strOpt(f, "email"),
          sourceAddress = selectAddress(f),
          requestMethod = method,
          urlRequestPath = path,
          requestStatus = status,
          userAgent = strOpt(f, "agent")),
          fields = Map(
            "email" -> f.path("email").asText(""),
            "action" -> f.path("action").asText(""),
            "status" -> f.path("status").asText(""),
            "path" -> f.path("path").asText(""),
            "method" -> f.path("method").asText(""),
            "errno" -> f.path("errno").asText(""),
            "uid" -> f.path("uid").asText(""),
            "service" -> f.path("service").asText(""),
            // raw chain kept so pipelines can re-select the client
            // with a trusted-proxy CIDR (the reference's
            // XffAddressSelector); normalized.sourceAddress holds the
            // no-config selection (last element)
            "remote_address_chain" ->
              f.path("remoteAddressChain").asText(""),
            "event_summary" -> summary.getOrElse(""))))
      }.getOrElse(None)
    }
  }

  /** Duo admin-API audit event (ref s/parser/Duopull.java — mozlog
    * envelope, event_* fields, AUTH-relevant admin actions). Real
    * duopull streams carry Logger "duopull" with Type "app.log"
    * (t/resources/testdata/duo_buffer1.txt), so the probe accepts the
    * tag in either mozlog field. */
  object DuopullMatcher extends PayloadMatcher {
    val name = "duopull"
    val fastKeywords = Seq("duopull")
    def parse(ctx: ParseCtx): Option[Event] = {
      val tagged = ctx.mozlogType.contains("duopull") ||
        ctx.mozlogLogger.contains("duopull")
      if (!tagged) None
      else ctx.json.map { f =>
        Some(mkEvent(ctx, name, Normalized(
          types = Seq(NormalizedType.Auth),
          subjectUser = strOpt(f, "event_username")),
          fields = Map(
            "event_action" -> f.path("event_action").asText(""),
            "event_description" -> f.path("event_description").asText(""),
            "event_object" -> f.path("event_object").asText(""),
            "path" -> f.path("path").asText(""))))
      }.getOrElse(None)
    }
  }

  /** Auth0 tenant log event (ref s/parser/Auth0.java — typed event
    * codes; success codes normalize to AUTH). */
  object Auth0Matcher extends PayloadMatcher {
    val name = "auth0"
    private val successCodes = Set("s", "ssa", "sepft")
    val fastKeywords = Seq("client_id")
    def parse(ctx: ParseCtx): Option[Event] = ctx.json.flatMap { root =>
      val r = if (root.has("jsonPayload")) root.path("jsonPayload") else root
      if (!r.has("client_id") || !r.has("type")) None
      else {
        val code = r.path("type").asText("")
        val ts = strOpt(r, "date").flatMap(TimeUtil.parseIso8601)
          .orElse(ctx.timestamp)
        // username: top-level user_name when present, else the first
        // details.prompts[] entry carrying one (ref s/parser/
        // Auth0.java:212-231 — real tenant logs put it only in the
        // prompt; found replaying the reference's authprof_buffer6)
        val user = strOpt(r, "user_name").orElse {
          val prompts = r.path("details").path("prompts")
          if (!prompts.isArray) None
          else scala.jdk.CollectionConverters
            .IteratorHasAsScala(prompts.elements()).asScala
            .flatMap(p => strOpt(p, "user_name")).toSeq.headOption
        }
        Some(mkEvent(ctx.copy(timestamp = ts), name, Normalized(
          types = if (successCodes(code)) Seq(NormalizedType.Auth) else Seq.empty,
          subjectUser = user,
          sourceAddress = strOpt(r, "ip"),
          // the acted-on object is the tenant application (ref
          // Auth0.java:154 setObject(getClientName()))
          objectValue = strOpt(r, "client_name")),
          fields = Map("type" -> code,
            "client_id" -> r.path("client_id").asText(""),
            "client_name" -> r.path("client_name").asText(""))))
      }
    }
  }

  /** Taskcluster API audit event (ref s/parser/Taskcluster.java —
    * mozlog envelope, clientId/apiMethod fields, AUTH normalization
    * for authenticated API calls). */
  object TaskclusterMatcher extends PayloadMatcher {
    val name = "taskcluster"
    val fastKeywords = Seq("taskcluster")
    def parse(ctx: ParseCtx): Option[Event] = {
      if (!ctx.mozlogType.exists(_.startsWith("taskcluster"))) None
      else ctx.json.map { f =>
        Some(mkEvent(ctx, name, Normalized(
          types = Seq(NormalizedType.Auth),
          subjectUser = strOpt(f, "clientId"),
          sourceAddress = strOpt(f, "sourceIp")),
          fields = Map(
            "api_method" -> f.path("apiMethod").asText(""),
            "resource" -> f.path("resource").asText(""))))
      }.getOrElse(None)
    }
  }

  /** Bugzilla audit log event (ref s/parser/BmoAudit.java — mozlog
    * envelope, user/action/target audit fields). */
  object BmoAuditMatcher extends PayloadMatcher {
    val name = "bmoaudit"
    val fastKeywords = Seq("audit.bmo")
    def parse(ctx: ParseCtx): Option[Event] = {
      if (!ctx.mozlogType.exists(_.startsWith("audit.bmo"))) None
      else ctx.json.map { f =>
        Some(mkEvent(ctx, name, Normalized(
          types = Seq(NormalizedType.Auth),
          subjectUser = strOpt(f, "user"),
          sourceAddress = strOpt(f, "remote_ip")),
          fields = Map(
            "action" -> f.path("action").asText(""),
            "target" -> f.path("target").asText(""))))
      }.getOrElse(None)
    }
  }

  /** GCP VPC flow log record (ref s/parser/GcpVpcFlow.java — 5-tuple
    * connection record under jsonPayload.connection). */
  object VpcFlowMatcher extends PayloadMatcher {
    val name = "gcp_vpc_flow"
    val fastKeywords = Seq("vpc_flows")
    def parse(ctx: ParseCtx): Option[Event] = ctx.json.flatMap { root =>
      val p = root.path("jsonPayload")
      val c = p.path("connection")
      if (c.isMissingNode || !c.has("src_ip")) None
      else Some(mkEvent(ctx, name, Normalized(
        sourceAddress = strOpt(c, "src_ip")),
        fields = Map(
          "src_ip" -> c.path("src_ip").asText(""),
          "src_port" -> c.path("src_port").asText(""),
          "dest_ip" -> c.path("dest_ip").asText(""),
          "dest_port" -> c.path("dest_port").asText(""),
          "protocol" -> c.path("protocol").asText(""),
          "bytes_sent" -> p.path("bytes_sent").asText(""),
          // alert INSTANCE_NAME metadata (ref Pioneer exfiltration)
          "src_instance_name" ->
            p.path("src_instance").path("vm_name").asText(""))))
    }
  }

  /** GuardDuty-style cloud finding (ref s/parser/GuardDuty.java /
    * gatekeeper ETD shapes): typed finding JSON with a numeric
    * severity, carried through as fields for the gatekeeper mapping. */
  object FindingMatcher extends PayloadMatcher {
    val name = "finding"
    val fastKeywords = Seq("\"findingType\"")
    def parse(ctx: ParseCtx): Option[Event] = ctx.json.flatMap { root =>
      val r = if (root.has("jsonPayload")) root.path("jsonPayload") else root
      if (!r.has("findingType")) None
      else Some(mkEvent(ctx, name, Normalized(),
        fields = Map(
          "finding_type" -> r.path("findingType").asText(""),
          "severity" -> r.path("severity").asText(""),
          "account" -> r.path("accountId").asText(""),
          "region" -> r.path("region").asText(""))))
    }
  }

  /** AMO (addons.mozilla.org) docker log (ref s/parser/AmoDocker.java:
    * 184-296): mozlog with logger `http_app_addons*`; the msg line is
    * classified into login / newversion / fxalogin / fileupload /
    * restricted / fileuploadmnt via the reference's regex set. */
  object AmoDockerMatcher extends PayloadMatcher {
    val name = "amodocker"
    val fastKeywords = Seq("http_app_addons")
    private val reLogin = """^User \((\d+): ([^)]+)\) logged in successfully.*""".r
    private val reNewVersion =
      """^New version: <Version: ([^>]+)> \((\d+)\) from <FileUpload: [^>]+>.*""".r
    private val reFxaLogin = """^Logging in FxA user ((.+)@(.+))$""".r
    private val reFileUpload = """^FileUpload created: \S+$""".r
    private val reRestricted =
      """^Restricting request from (email|ip) (\S+) \(reputation=.*""".r
    private val reFileUploadMnt = """^UPLOAD: '([^']+)' \((\d+) bytes\).*""".r
    def parse(ctx: ParseCtx): Option[Event] = {
      if (!ctx.mozlogLogger.exists(_.startsWith("http_app_addons"))) None
      else ctx.json.flatMap { f =>
        val msg = strOpt(f, "msg")
        val addr = strOpt(f, "remoteAddressChain").filter(_.nonEmpty)
        val uid = strOpt(f, "uid")
        if (msg.isEmpty || addr.isEmpty || uid.isEmpty) None
        else {
          val base = Map("msg" -> msg.get) ++
            strOpt(f, "email").map("email" -> _) ++
            strOpt(f, "guid").map("guid" -> _) ++
            strOpt(f, "from_api").map("from_api" -> _) ++
            strOpt(f, "upload").map("upload" -> _) ++
            strOpt(f, "upload_hash").map("upload_hash" -> _)
          val (tpe, extra): (String, Map[String, String]) = msg.get match {
            case reLogin(numericId, userName) =>
              // UID field is unset on this message; override from msg
              ("login", Map("uid" -> userName, "numeric_user_id" -> numericId))
            case reNewVersion(version, addonId) =>
              ("newversion", Map("uid" -> uid.get,
                "addon_version" -> version, "addon_id" -> addonId))
            case reFxaLogin(email, _, _) =>
              ("fxalogin", Map("uid" -> uid.get) ++
                (if (base.contains("email")) Map.empty
                 else Map("email" -> email)))
            case reFileUpload() => ("fileupload", Map("uid" -> uid.get))
            case reRestricted(kind, value) =>
              ("restricted", Map("uid" -> uid.get,
                "restricted_value" -> (if (kind == "email") value else addr.get)))
            case reFileUploadMnt(fileName, bytes) =>
              ("fileuploadmnt", Map("uid" -> uid.get,
                "file_name" -> fileName, "bytes" -> bytes))
            case _ => ("unclassified", Map("uid" -> uid.get))
          }
          Some(mkEvent(ctx, name,
            Normalized(sourceAddress = addr),
            fields = base ++ extra + ("amo_type" -> tpe)))
        }
      }
    }
  }

  /** GCP audit log entry (ref s/parser/GcpAudit.java:131-218):
    * LogEntry protoPayload of @type google.cloud.audit.AuditLog;
    * AUTH_SESSION when principal + caller IP + resource all present. */
  object GcpAuditMatcher extends PayloadMatcher {
    val name = "gcpaudit"
    val fastKeywords = Seq("google.cloud.audit.AuditLog")
    def parse(ctx: ParseCtx): Option[Event] = ctx.json.flatMap { root =>
      val pp = root.path("protoPayload")
      if (!pp.isObject ||
          pp.path("@type").asText("") != "type.googleapis.com/google.cloud.audit.AuditLog")
        None
      else {
        val principal = strOpt(pp.path("authenticationInfo"), "principalEmail")
        val callerIp = strOpt(pp.path("requestMetadata"), "callerIp")
        val resource = Option(pp.path("authorizationInfo"))
          .filter(a => a.isArray && a.size > 0)
          .flatMap(a => strOpt(a.get(0), "resource"))
        val n =
          if (principal.isDefined && callerIp.isDefined && resource.isDefined)
            Normalized(types = Seq(NormalizedType.AuthSession),
              subjectUser = principal, sourceAddress = callerIp,
              objectValue = resource)
          else Normalized(sourceAddress = callerIp)
        Some(mkEvent(ctx, name, n, fields =
          Map.empty[String, String] ++
            principal.map("principal_email" -> _) ++
            resource.map("resource" -> _) ++
            strOpt(pp, "methodName").map("method_name" -> _) ++
            strOpt(pp, "serviceName").map("service_name" -> _)))
      }
    }
  }

  /** Phabricator audit log line (ref s/parser/Phabricator.java:69-99):
    * tab-separated with a bracketed RFC1123-ish timestamp; AUTH_SESSION
    * with object fixed to "phabricator" when a user is present. */
  object PhabricatorMatcher extends PayloadMatcher {
    val name = "phabricator"
    val fastKeywords = Seq("]\t")
    private val re =
      ("""^\[([^\]]+)\]\t(\d+)\t(\S+)\t(\S+)\t(\S+)\t(\S+)\t(\S+)\t(\S+)\t(\S+)""" +
        """\t(\d+)\t(\d+)$""").r
    private val fmt = java.time.format.DateTimeFormatter
      .ofPattern("EEE, dd MMM yyyy HH:mm:ss Z", java.util.Locale.US)
    private def v(s: String): Option[String] = Option(s).filter(_ != "-")
    def parse(ctx: ParseCtx): Option[Event] = ctx.raw match {
      case re(ts, pid, host, addr, user, controller, function, path, referer,
          status, rtime) =>
        val t = scala.util.Try(
          java.time.OffsetDateTime.parse(ts, fmt).toInstant).toOption
          .orElse(ctx.timestamp)
        val u = v(user)
        Some(mkEvent(ctx.copy(timestamp = t), name, Normalized(
          types = if (u.isDefined) Seq(NormalizedType.AuthSession) else Seq.empty,
          subjectUser = u,
          sourceAddress = Some(addr),
          objectValue = if (u.isDefined) Some("phabricator") else None),
          fields = Map("pid" -> pid, "hostname" -> host,
            "status" -> status, "rtime" -> rtime) ++
            v(controller).map("controller" -> _) ++
            v(function).map("function" -> _) ++
            v(path).map("path" -> _) ++
            v(referer).map("referer" -> _)))
      case _ => None
    }
  }

  /** Private Relay event (ref s/parser/PrivateRelay.java:112-131):
    * mozlog logger `fx-private-relay`; email_relay / fxa_rp_event. */
  object PrivateRelayMatcher extends PayloadMatcher {
    val name = "privaterelay"
    val fastKeywords = Seq("fx-private-relay")
    def parse(ctx: ParseCtx): Option[Event] = {
      if (!ctx.mozlogLogger.contains("fx-private-relay")) None
      else ctx.json.map { f =>
        val msg = strOpt(f, "msg")
        mkEvent(ctx, name, Normalized(), fields =
          Map.empty[String, String] ++
            msg.map("msg" -> _) ++
            msg.collect {
              case "email_relay" => "event_type" -> "email_relay"
              case "fxa_rp_event" => "event_type" -> "fxa_rp_event"
            } ++
            strOpt(f, "fxa_uid").map("uid" -> _) ++
            strOpt(f, "real_address").map("real_address" -> _) ++
            strOpt(f, "relay_address").map("relay_address" -> _) ++
            (if (f.path("relay_address_id").isNumber)
               Some("relay_address_id" -> f.path("relay_address_id").asLong.toString)
             else None))
      }
    }
  }

  /** FxA content-server request (ref s/parser/FxaContent.java:100-141):
    * mozlog logger `fxa-content-server`; request path classified, source
    * address from clientaddress or last entry of remoteaddresschain. */
  object FxaContentMatcher extends PayloadMatcher {
    val name = "fxacontent"
    val fastKeywords = Seq("fxa-content-server")
    def parse(ctx: ParseCtx): Option[Event] = {
      if (!ctx.mozlogLogger.contains("fxa-content-server")) None
      else ctx.json.map { f =>
        val path = strOpt(f, "path")
        val requestType = path.map { p =>
          if (p.startsWith("/metrics-flow")) "metrics_flow"
          else if (p.startsWith("/metrics")) "metrics"
          else if (p.startsWith("/authorization?")) "authorization"
          else if (p.startsWith("/signin")) "signin"
          else if (p.startsWith("/signup")) "signup"
          else if (p.startsWith("/validate-email-domain")) "validate_email_domain"
          else "other"
        }
        // field names appear BOTH lowercase (the reference model's
        // @JsonProperty spellings) and camelCase (what the real
        // content-server emits — t/resources/testdata/
        // customs_contentserver.txt); probe both.
        def strAny(names: String*): Option[String] =
          names.iterator.flatMap(strOpt(f, _)).nextOption()
        // remoteAddressChain is a JSON-encoded string array; the XFF
        // client choice (absent trusted-proxy config) is the last hop
        val client = strAny("clientaddress", "clientAddress").orElse(
          strAny("remoteaddresschain", "remoteAddressChain").flatMap { rac =>
            rac.split(",").map(_.trim.stripPrefix("[").stripSuffix("]")
              .stripPrefix("\"").stripSuffix("\"")).filter(_.nonEmpty).lastOption
          })
        mkEvent(ctx, name, Normalized(sourceAddress = client), fields =
          Map.empty[String, String] ++
            path.map("path" -> _) ++
            requestType.map("request_type" -> _) ++
            strOpt(f, "method").map("method" -> _) ++
            strAny("useragent", "userAgent").map("useragent" -> _) ++
            intOpt(f, "status").map(s => "status" -> s.toString))
      }
    }
  }

  /** iprepd reputation-service applied-violation log (ref
    * s/parser/IPrepdLog.java:92-141): mozlog logger `iprepd` with the
    * full applied-violation field set required. */
  object IPrepdLogMatcher extends PayloadMatcher {
    val name = "iprepd"
    val fastKeywords = Seq("iprepd")
    private val required = Seq("msg", "violation", "decay_after",
      "original_reputation", "reputation", "type", "exception", "object")
    def parse(ctx: ParseCtx): Option[Event] = {
      if (!ctx.mozlogLogger.contains("iprepd")) None
      else ctx.json.filter(f => required.forall(f.has)).map { f =>
        mkEvent(ctx, name, Normalized(), fields = Map(
          "msg" -> f.path("msg").asText(""),
          "violation" -> f.path("violation").asText(""),
          "decay_after" -> f.path("decay_after").asText(""),
          "original_reputation" -> f.path("original_reputation").asLong.toString,
          "reputation" -> f.path("reputation").asLong.toString,
          "object_type" -> f.path("type").asText(""),
          "exception" -> f.path("exception").asBoolean.toString,
          "object" -> f.path("object").asText("")))
      }
    }
  }

  /** Re-ingested alert (ref s/parser/Alert.java:28-63): pipeline alert
    * output fed back as input; requires the full alert field set. */
  object AlertMatcher extends PayloadMatcher {
    val name = "alert"
    val fastKeywords = Seq("\"summary\"")
    def parse(ctx: ParseCtx): Option[Event] = ctx.json.flatMap { root =>
      val required = Seq("summary", "metadata", "severity", "category",
        "id", "timestamp")
      if (!required.forall(root.has)) None
      else {
        val ts = strOpt(root, "timestamp").flatMap(TimeUtil.parseIso8601)
          .orElse(ctx.timestamp)
        // metadata entries flatten to meta_<key> — PostProcessing
        // consumes alert metadata (watchlist keys on sourceaddress /
        // email, AlertSummary on the classifier fields), so the
        // parsed event must carry them (ref s/alert/Alert.java
        // metadata list; list-valued keys stay ", "-joined and split
        // via AlertMeta.splitListValues)
        val meta = {
          val b = Map.newBuilder[String, String]
          val it = root.path("metadata").elements()
          while (it.hasNext) {
            val e = it.next()
            val k = e.path("key").asText("")
            if (k.nonEmpty) b += (s"meta_$k" -> e.path("value").asText(""))
          }
          b.result()
        }
        Some(mkEvent(ctx.copy(timestamp = ts), name, Normalized(), fields = Map(
          "alert_id" -> root.path("id").asText(""),
          "summary" -> root.path("summary").asText(""),
          "severity" -> root.path("severity").asText(""),
          "category" -> root.path("category").asText("")) ++
          strOpt(root, "subcategory").map("subcategory" -> _) ++ meta))
      }
    }
  }

  /** Configuration tick (ref s/parser/CfgTick.java:16-129): the
    * periodic pipeline-settings heartbeat; scalar/array values are
    * flattened into comma-joined strings. */
  object CfgTickMatcher extends PayloadMatcher {
    val name = "cfgtick"
    val fastKeywords = Seq("configuration_tick")
    def parse(ctx: ParseCtx): Option[Event] = ctx.json.flatMap { root =>
      if (!root.has("configuration_tick")) None
      else {
        val b = Map.newBuilder[String, String]
        val it = root.properties().iterator()
        while (it.hasNext) {
          val e = it.next()
          val v = e.getValue
          if (v.isValueNode) b += e.getKey -> v.asText
          else if (v.isArray) {
            val parts = (0 until v.size).map(i => v.get(i).asText)
            b += e.getKey -> parts.mkString(", ")
          }
        }
        Some(mkEvent(ctx, name, Normalized(), fields = b.result()))
      }
    }
  }

  /** AWS GuardDuty finding, typed (ref s/parser/GuardDuty.java:25-83):
    * either a CloudWatch event wrapper with source aws.guardduty, or a
    * bare Finding with the GuardDuty-specific field set. */
  object GuardDutyMatcher extends PayloadMatcher {
    val name = "guardduty"
    val fastKeywords = Seq("aws.guardduty", "arn:aws:guardduty")
    private val bareRequired = Seq("type", "arn", "accountId", "title", "description")
    def parse(ctx: ParseCtx): Option[Event] = ctx.json.flatMap { root =>
      val finding =
        if (root.path("source").asText("") == "aws.guardduty" &&
            root.path("detail").isObject) Some(root.path("detail"))
        else if (bareRequired.forall(root.has)) Some(root)
        else None
      finding.map { f =>
        // dns action domain + instance tags feed the config-driven
        // finding matchers (ref GuardDutyFindingMatcher.java — tags
        // land as tag:<key> entries)
        val domain = strOpt(
          f.path("service").path("action").path("dnsRequestAction"), "domain")
        val tagsNode = f.path("resource").path("instanceDetails").path("tags")
        val tags =
          if (!tagsNode.isArray) Nil
          else scala.jdk.CollectionConverters
            .IteratorHasAsScala(tagsNode.elements()).asScala.flatMap { t =>
              strOpt(t, "key").zip(strOpt(t, "value"))
                .map { case (k, v) => s"tag:$k" -> v }
            }.toSeq
        mkEvent(ctx, name, Normalized(), fields =
          Map.empty[String, String] ++
            strOpt(f, "type").map("finding_type" -> _) ++
            strOpt(f, "arn").map("arn" -> _) ++
            strOpt(f, "accountId").map("account" -> _) ++
            strOpt(f, "region").map("region" -> _) ++
            strOpt(f, "title").map("title" -> _) ++
            strOpt(f, "description").map("description" -> _) ++
            strOpt(f, "id").map("finding_id" -> _) ++
            domain.map("domain" -> _) ++ tags ++
            (if (f.path("severity").isNumber)
               Some("severity" -> f.path("severity").asDouble.toString)
             else None))
      }
    }
  }

  /** GCP Event Threat Detection finding, typed (ref s/parser/
    * ETDBeta.java:22-88): Stackdriver resource.type threat_detector,
    * or a bare finding with detectionPriority + eventTime. */
  object EtdMatcher extends PayloadMatcher {
    val name = "etd"
    val fastKeywords = Seq("threat_detector", "detectionPriority")
    def parse(ctx: ParseCtx): Option[Event] = ctx.json.flatMap { root =>
      val fromStackdriver =
        if (root.path("resource").path("type").asText("") == "threat_detector" &&
            root.path("jsonPayload").isObject) Some(root.path("jsonPayload"))
        else None
      val finding = fromStackdriver.orElse(
        if (root.has("detectionPriority") && root.has("eventTime")) Some(root)
        else None)
      finding.map { f =>
        val dc = f.path("detectionCategory")
        val props = f.path("properties")
        val ts = strOpt(f, "eventTime").flatMap(TimeUtil.parseIso8601)
          .orElse(ctx.timestamp)
        mkEvent(ctx.copy(timestamp = ts), name, Normalized(), fields =
          Map.empty[String, String] ++
            strOpt(f, "detectionPriority").map("detection_priority" -> _) ++
            strOpt(f, "eventTime").map("event_time" -> _) ++
            strOpt(dc, "ruleName").map("rule_name" -> _) ++
            strOpt(dc, "subRuleName").map("sub_rule_name" -> _) ++
            strOpt(dc, "technique").map("technique" -> _) ++
            strOpt(dc, "indicator").map("indicator" -> _) ++
            strOpt(props, "project_id").map("project_id" -> _) ++
            strOpt(props, "location").map("location" -> _) ++
            // gcp org-level routing key the gatekeeper alerts carry
            // (ref ETDTransforms project_number metadata)
            strOpt(f.path("sourceId"), "projectNumber")
              .map("project_number" -> _))
      }
    }
  }

  /** Catch-all: any line becomes a RAW event (parser totality). */
  object RawMatcher extends PayloadMatcher {
    val name = "raw"
    val fastKeywords = Seq.empty[String]
    def parse(ctx: ParseCtx): Option[Event] =
      Some(mkEvent(ctx, name, Normalized(), fields = Map.empty))
  }

  /** Ordered probe list (first match wins, RAW last — ref
    * Parser.java:597-620 fixed matcher order). */
  val matchers: Seq[PayloadMatcher] =
    Seq(GlbMatcher, NginxMatcher, FxaAuthMatcher, FxaContentMatcher,
      OpenSshMatcher, CloudtrailMatcher, GcpAuditMatcher, VpcFlowMatcher,
      BmoAuditMatcher, IPrepdLogMatcher, TaskclusterMatcher,
      AmoDockerMatcher, DuopullMatcher, AlertMatcher, GuardDutyMatcher,
      EtdMatcher, CfgTickMatcher, PrivateRelayMatcher, Auth0Matcher,
      FindingMatcher, ApacheCombinedMatcher, PhabricatorMatcher,
      RawMatcher)

  // -- envelope handling ----------------------------------------------------

  private def strOpt(n: JsonNode, f: String): Option[String] =
    if (n.hasNonNull(f)) Some(n.path(f).asText) else None

  private def intOpt(n: JsonNode, f: String): Option[Int] =
    if (n.hasNonNull(f) && n.path(f).canConvertToInt) Some(n.path(f).asInt)
    else if (n.hasNonNull(f)) scala.util.Try(n.path(f).asText.toInt).toOption
    else None

  /** Host/path split. Hot path (every GLB/nginx/apache line): a
    * guarded fast path for the overwhelmingly common simple shape
    * `scheme://host/path` — byte-identical to `java.net.URI` on that
    * shape by construction (plain registry host, no userinfo/port/
    * IPv6, no query/fragment, no percent-escapes, every char in the
    * RFC3986 unreserved set so URI's decode is the identity) —
    * falling back to the original URI parse for anything else.
    * `new java.net.URI` costs a full spec parse + exception-driven
    * control flow per line and dominated the per-line profile. */
  private[graft] def splitUrl(url: String): (Option[String], Option[String]) = {
    if (url == null) return (None, None)
    val sep = url.indexOf("://")
    if (sep > 0 && simpleUrlChars(url) && validScheme(url, sep)) {
      val hostStart = sep + 3
      val slash = url.indexOf('/', hostStart)
      val hostEnd = if (slash < 0) url.length else slash
      if (hostEnd > hostStart) {
        val host = url.substring(hostStart, hostEnd)
        // URI's RFC2396 hostname grammar, not just a char-set check:
        // every label non-empty with alphanumeric first/last chars
        // (no '..', no '-foo'/'foo-'), and the FINAL label starting
        // with a LETTER (URI's toplabel rule — which also keeps every
        // IPv4-shaped host on the exact URI path below). Anything
        // narrower falls through to java.net.URI, so the fast path
        // only ever claims hosts URI itself would return.
        def alnum(c: Char) = (c >= 'a' && c <= 'z') ||
          (c >= 'A' && c <= 'Z') || (c >= '0' && c <= '9')
        var i = hostStart
        var hostOk = true
        var labelStart = i
        while (hostOk && i < hostEnd) {
          val c = url.charAt(i)
          if (c == '.') {
            hostOk = i > labelStart && alnum(url.charAt(i - 1))
            labelStart = i + 1
          } else if (alnum(c)) ()
          else if (c == '-') hostOk = i > labelStart
          else hostOk = false
          i += 1
        }
        if (hostOk) {
          val f = if (labelStart < hostEnd) url.charAt(labelStart) else ' '
          hostOk = ((f >= 'a' && f <= 'z') || (f >= 'A' && f <= 'Z')) &&
            alnum(url.charAt(hostEnd - 1))
        }
        if (hostOk)
          return (Some(host),
            if (slash < 0) None else Some(url.substring(slash)))
      }
    }
    scala.util.Try {
      val u = new java.net.URI(url)
      (Option(u.getHost), Option(u.getPath).filter(_.nonEmpty))
    }.getOrElse((None, if (url.startsWith("/")) Some(url) else None))
  }

  /** Fast-path guard: every char unreserved-or-separator, so URI
    * neither rejects nor decodes anything (no ':' outside the scheme
    * separator — ports and userinfo take the slow path). */
  private def simpleUrlChars(url: String): Boolean = {
    var i = 0
    val n = url.length
    var colonSeen = false
    while (i < n) {
      val c = url.charAt(i)
      val ok = (c >= 'a' && c <= 'z') || (c >= 'A' && c <= 'Z') ||
        (c >= '0' && c <= '9') || c == '-' || c == '.' || c == '_' ||
        c == '~' || c == '/' ||
        (c == ':' && !colonSeen && { colonSeen = true; true })
      if (!ok) return false
      i += 1
    }
    true
  }

  /** RFC3986 scheme: ALPHA *( ALPHA / DIGIT / "+" / "-" / "." ). */
  private def validScheme(url: String, sep: Int): Boolean = {
    val c0 = url.charAt(0)
    if (!((c0 >= 'a' && c0 <= 'z') || (c0 >= 'A' && c0 <= 'Z'))) return false
    var i = 1
    while (i < sep) {
      val c = url.charAt(i)
      if (!((c >= 'a' && c <= 'z') || (c >= 'A' && c <= 'Z') ||
          (c >= '0' && c <= '9') || c == '+' || c == '-' || c == '.'))
        return false
      i += 1
    }
    true
  }

  private val apacheFmt = java.time.format.DateTimeFormatter
    .ofPattern("dd/MMM/yyyy:HH:mm:ss Z", java.util.Locale.US)

  private def parseApacheTs(s: String): Option[Instant] =
    scala.util.Try(java.time.OffsetDateTime.parse(s, apacheFmt).toInstant).toOption

  /** Random v4 UUID from ThreadLocalRandom — same format and
    * collision guarantees class (122 random bits) as
    * `UUID.randomUUID()`, WITHOUT its shared synchronized
    * SecureRandom: at local[32] the global lock serialized every
    * parsed event's id draw (the id is a per-run-random event handle,
    * never an output column — no oracle can observe the generator). */
  private def fastRandomUuid(): String = {
    val r = java.util.concurrent.ThreadLocalRandom.current()
    val msb = (r.nextLong() & 0xffffffffffff0fffL) | 0x0000000000004000L
    val lsb = (r.nextLong() & 0x3fffffffffffffffL) | 0x8000000000000000L
    new UUID(msb, lsb).toString
  }

  private def mkEvent(ctx: ParseCtx, payloadType: String, n: Normalized,
      fields: Map[String, String]): Event =
    Event(
      id = fastRandomUuid(),
      timestamp = java.sql.Timestamp.from(ctx.timestamp.getOrElse(Instant.EPOCH)),
      payloadType = payloadType,
      raw = ctx.raw,
      normalized = n,
      fields = fields,
      stackdriverProject = ctx.project,
      stackdriverLabels = ctx.labels,
      mozlogHostname = ctx.mozlogHostname,
      mozlogType = ctx.mozlogType,
      mozlogLogger = ctx.mozlogLogger)

  /** Strip Stackdriver LogEntry / Mozlog envelopes, extract event time
    * (ref Parser.java:423-449, :310-421; Event.java:127-135). */
  private[parse] def stripEnvelope(line: String, mapper: ObjectMapper): ParseCtx = {
    val trimmed = line.trim
    val json =
      if (trimmed.startsWith("{")) scala.util.Try(mapper.readTree(trimmed)).toOption
      else None
    json match {
      case Some(root) if root.has("logName") || root.has("httpRequest") ||
          root.has("jsonPayload") || root.has("textPayload") =>
        // Stackdriver LogEntry
        val ts = strOpt(root, "timestamp").flatMap(TimeUtil.parseIso8601)
        // the project comes from resource.labels.project_id (ref
        // Parser.getStackdriverProject, Parser.java:295-308 — found
        // replaying httpreq_filter.txt, whose three lines share one
        // logName project but differ in resource labels); the logName
        // path segment is only a fallback for label-less entries
        val project = strOpt(root.path("resource").path("labels"),
            "project_id")
          .orElse(strOpt(root, "logName")
            .flatMap(_.split("/").drop(1).headOption))
        val labels = Option(root.path("labels")).filter(_.isObject).map { l =>
          val it = l.properties().iterator()
          val b = Map.newBuilder[String, String]
          while (it.hasNext) { val e = it.next(); b += e.getKey -> e.getValue.asText }
          b.result()
        }.getOrElse(Map.empty)
        // Second-stage strip: a Mozlog record nested in the LogEntry's
        // jsonPayload (ref Parser.java second envelope pass — e.g.
        // k8s-containerized mozlog emitters). The mozlog ns Timestamp
        // WINS over the LogEntry timestamp (ref Event.setMozlog,
        // s/parser/Event.java:127-135 — found replaying
        // customs_velocity1, whose per-event times live only in the
        // mozlog header while the LogEntry timestamp is constant);
        // the LogEntry timestamp is the fallback.
        val jp = root.path("jsonPayload")
        if (jp.isObject && jp.has("Timestamp") && jp.has("Fields")) {
          val mts = (if (jp.path("Timestamp").isNumber)
              Some(TimeUtil.parseEpochNanos(jp.path("Timestamp").asLong))
            else None).orElse(ts)
          ParseCtx(line, Some(jp.path("Fields")), mts, project, labels,
            strOpt(jp, "Hostname"), strOpt(jp, "Type"), strOpt(jp, "Logger"))
        } else ParseCtx(line, Some(root), ts, project, labels, None, None)
      case Some(root) if root.has("Timestamp") && root.has("Fields") =>
        // Mozlog envelope: ns epoch timestamp, payload under Fields
        val ts = if (root.path("Timestamp").isNumber)
          Some(TimeUtil.parseEpochNanos(root.path("Timestamp").asLong)) else None
        ParseCtx(line, Some(root.path("Fields")), ts,
          None, Map.empty, strOpt(root, "Hostname"), strOpt(root, "Type"),
          strOpt(root, "Logger"))
      case other =>
        ParseCtx(line, other, None, None, Map.empty, None, None)
    }
  }

  // probe order as a plain array: the per-line matcher loop is the
  // parse hot path and the iterator/flatMap form allocated two
  // closures + an iterator per line
  private val matcherArr: Array[PayloadMatcher] = matchers.toArray

  /** Parse one line (total: never throws, unknown → RAW). */
  def parseLine(line: String, mapper: ObjectMapper): Event = {
    val ctx =
      try stripEnvelope(line, mapper)
      catch { case _: Throwable => ParseCtx(line, None, None, None, Map.empty, None, None) }
    var i = 0
    while (i < matcherArr.length) {
      val m = matcherArr(i)
      if (m.fastMatch(line)) {
        val r = try m.parse(ctx) catch { case _: Throwable => None }
        if (r.isDefined) return r.get
      }
      i += 1
    }
    // unreachable: RawMatcher is total and last
    mkEvent(ctx, RawMatcher.name, Normalized(), Map.empty)
  }

  /** Distributed parse: one lazy ObjectMapper per partition. */
  def parse(lines: Dataset[String]): Dataset[Event] = {
    val spark = lines.sparkSession
    import spark.implicits._
    lines.mapPartitions { it =>
      val mapper = new ObjectMapper()
      it.map(parseLine(_, mapper))
    }
  }

  /** Column-level fast-matcher pre-filter for a target payload type:
    * apply BEFORE `parse` so the scan prunes non-candidate lines
    * (keeps the reference's manual pushdown, Parser.java:508-516).
    * Derived from the matcher's own `fastKeywords`, so the pushdown
    * predicate is exactly the fast-match probe. */
  def fastFilter(payloadType: String): org.apache.spark.sql.Column =
    fastFilterAny(Seq(payloadType))

  /** Pre-parse pushdown admitting lines that could match ANY of the
    * given payload types. Pipelines that keep several formats (e.g.
    * HTTP_REQUEST ← glb|nginx|apache_combined) filter once with the
    * union of keywords; lines passing the filter still go through the
    * ordered probe, so semantics are unchanged — only non-candidate
    * lines are pruned before the opaque mapPartitions parse. */
  def fastFilterAny(payloadTypes: Seq[String]): org.apache.spark.sql.Column = {
    import org.apache.spark.sql.functions._
    val kws = payloadTypes.flatMap(t =>
      matchers.find(_.name == t).map(_.fastKeywords).getOrElse(Seq.empty))
    val unknown = payloadTypes.exists(t => !matchers.exists(_.name == t))
    if (unknown || payloadTypes.exists(t =>
        matchers.find(_.name == t).exists(_.fastKeywords.isEmpty)))
      lit(true) // a keywordless (or unknown) type admits everything
    else kws.distinct.map(k => col("value").contains(k)).reduce(_ || _)
  }

  /** Payload types that can produce a given normalized type — used by
    * pipelines to build the pushdown for "all AUTH events" etc. */
  def payloadTypesFor(normalizedType: String): Seq[String] = normalizedType match {
    case "HTTP_REQUEST" => Seq("glb", "nginx", "apache_combined")
    case "AUTH" => Seq("openssh", "cloudtrail", "duopull", "auth0",
      "taskcluster", "bmoaudit")
    // every matcher that can emit AUTH_SESSION (gcpaudit/phabricator
    // were missing — the fast filter silently pruned GCP audit events
    // out of the auth-profile pipeline; found replaying the
    // reference's authprof_buffer2 fixture)
    case "AUTH_SESSION" => Seq("fxaauth", "gcpaudit", "phabricator")
    case _ => Seq.empty
  }
}
