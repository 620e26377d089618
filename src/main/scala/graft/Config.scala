package graft

/** Environment-variable configuration — the clean-room twin of the
  * reference's only public configuration API
  * (`/root/reference/src/config.rs:14-41`):
  *
  *   - `OANDA_AUTH_TOKEN`, `OANDA_ACCOUNT_ID` — required; a missing var
  *     yields the reference's exact error text ("… environment variable not
  *     set", config.rs:15-18).
  *   - `OANDA_ENVIRONMENT` — default `fxpractice` (config.rs:20-21).
  *   - `OANDA_INSTRUMENTS` — default `EUR_USD` (config.rs:23-24).
  *   - `ZMQ_PUBLISHER_ADDRESS` — default: tcp bind on all interfaces, port
  *     9500 (config.rs:26-27; the literal would open a nested comment here).
  *
  * The reference never logs the auth token (verified: no print/log of
  * `auth_token` anywhere in its source); `toString` here redacts it so the
  * secret cannot leak through logs or exceptions either.
  */
final case class Config(
    authToken: String,
    accountId: String,
    environment: String,
    instruments: String,
    zmqAddress: String) {

  /** Streaming API base URL (config.rs:38-40). */
  def baseUrl: String = s"https://stream-$environment.oanda.com"

  /** Full pricing-stream URL (oanda_client.rs:14-19). Percent-encoding of
    * the instrument list matches the reference's `urlencoding::encode` for
    * the instrument alphabet (letters, digits, `_`, `,` — no spaces, so
    * URLEncoder's `+`-for-space divergence cannot arise). */
  def streamUrl: String = {
    val enc = java.net.URLEncoder.encode(instruments, "UTF-8")
    s"$baseUrl/v3/accounts/$accountId/pricing/stream?instruments=$enc"
  }

  override def toString: String =
    s"Config(authToken=<redacted>, accountId=$accountId, environment=$environment, " +
      s"instruments=$instruments, zmqAddress=$zmqAddress)"
}

object Config {

  /** Usage text shown on configuration error — mirrors `main.rs:33-41`. */
  val usage: String =
    """Please ensure the following environment variables are set:
      |  OANDA_AUTH_TOKEN=<YOUR_TOKEN>
      |  OANDA_ACCOUNT_ID=<YOUR_ACCOUNT_ID>
      |  OANDA_ENVIRONMENT=fxtrade | fxpractice (e.g., 'fxpractice')
      |  OANDA_INSTRUMENTS=EUR_USD,USD_CAD (comma-separated list of instruments)
      |
      |Optional:
      |  ZMQ_PUBLISHER_ADDRESS=tcp://*:9500 (default bind address for ZMQ)""".stripMargin

  /** Build from an environment map (injectable for tests; defaults to the
    * process env like `Config::from_env`). Left = the reference's error
    * message for the first missing required variable. */
  def fromEnv(env: Map[String, String] = sys.env): Either[String, Config] =
    for {
      token <- env.get("OANDA_AUTH_TOKEN")
        .toRight("OANDA_AUTH_TOKEN environment variable not set")
      account <- env.get("OANDA_ACCOUNT_ID")
        .toRight("OANDA_ACCOUNT_ID environment variable not set")
    } yield Config(
      authToken = token,
      accountId = account,
      environment = env.getOrElse("OANDA_ENVIRONMENT", "fxpractice"),
      instruments = env.getOrElse("OANDA_INSTRUMENTS", "EUR_USD"),
      zmqAddress = env.getOrElse("ZMQ_PUBLISHER_ADDRESS", "tcp://*:9500"))
}
