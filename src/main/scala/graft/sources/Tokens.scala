package graft.sources

/** OAuth token lifecycle for authed page sources — the reference's
  * check_token / get_token / store_tokens chain re-expressed
  * (/root/reference/flows/pull_recent_tracks.py:73-110,
  * /root/reference/util/login.py:1-60): validate the stored access
  * token, exchange the refresh token for a fresh one when stale,
  * persist the rotated pair back to the secret store.
  *
  * Both backends are injected interfaces: this is edge/driver-side
  * deployment plumbing (like PageSource fetching), and no network
  * client ships in a zero-egress build — specs drive fakes, a
  * deployment supplies an HTTP token endpoint and its secret manager
  * (the reference uses Prefect Cloud secrets).
  */
trait SecretStore extends Serializable {
  def get(name: String): Option[String]
  def put(name: String, value: String): Unit
}

/** The two token API calls of the OAuth refresh-grant flow. */
trait TokenEndpoint extends Serializable {
  /** check_token: is this access token still accepted? (the reference
    * probes /v1/me and checks for 200.) */
  def isValid(accessToken: String): Boolean

  /** get_token: exchange a refresh token → (access token, optionally a
    * rotated refresh token — providers that don't rotate return None).
    * Throws on a rejected refresh token (raise_for_status). */
  def refresh(refreshToken: String): (String, Option[String])
}

/** A source of currently-valid access tokens, for PageSource
  * implementations that need auth on every fetch. */
trait TokenSource extends Serializable {
  def accessToken(): String
}

/** The one-time authorization-code grant that BOOTSTRAPS the refresh
  * loop — the reference's login web app re-expressed as a contract
  * (/root/reference/util/login.py:19-45): build the provider
  * authorize URL (response_type=code, scope, redirect_uri, a
  * random `state` nonce), receive the callback, REJECT a mismatched
  * state or a provider error, then exchange the code for the initial
  * (access, refresh) token pair. Deployment supplies the HTTP pieces
  * (a browser redirect + a tiny callback endpoint); specs drive a
  * fake exchanger. */
trait AuthCodeExchanger extends Serializable {
  /** The token-endpoint call of the auth-code grant:
    * grant_type=authorization_code, code + redirect_uri (+ client
    * credentials, owned by the implementation). Returns
    * (access token, refresh token). Throws on a rejected code. */
  def exchange(code: String, redirectUri: String): (String, String)
}

/** Drives the one-time grant and seeds the [[SecretStore]] that
  * [[RefreshingTokenSource]] then lives off — together they cover the
  * token lifecycle from zero stored state. `state` is caller-supplied
  * entropy (the reference uses a 16-byte hex nonce); the flow only
  * enforces that the callback ECHOES it. */
final class AuthCodeFlow(
    store: SecretStore,
    exchanger: AuthCodeExchanger,
    clientId: String,
    redirectUri: String,
    state: String,
    authorizeBase: String = "https://accounts.spotify.com/authorize",
    scope: String = "user-read-recently-played",
    accessName: String = "api-access-token",
    refreshName: String = "api-refresh-token") extends Serializable {

  /** The /login redirect target — where the flow sends the user.
    * Every parameter is percent-encoded (RFC 6749 §4.1.1): a
    * redirect_uri carrying its own query string, or a multi-scope
    * value with spaces, must not split this URL's query. */
  def authorizeUrl: String = {
    def enc(v: String) = java.net.URLEncoder.encode(v, "UTF-8")
    s"$authorizeBase?response_type=code&client_id=${enc(clientId)}" +
      s"&scope=${enc(scope)}&redirect_uri=${enc(redirectUri)}&state=${enc(state)}"
  }

  /** The /callback handler: state check, provider-error check, then
    * code→token exchange; the minted pair lands in the secret store,
    * which makes every later [[RefreshingTokenSource.accessToken]]
    * call work from zero. Returns the access token. */
  def complete(callbackState: String, code: Option[String],
      error: Option[String]): String = {
    // constant-time comparison: a timing side channel on the CSRF
    // nonce check is negligible for a single-use random state, but
    // MessageDigest.isEqual costs nothing and removes it outright.
    // A missing state (null from a callback param lookup) is the
    // same rejection, not an NPE.
    val stateOk = callbackState != null && java.security.MessageDigest.isEqual(
      callbackState.getBytes(java.nio.charset.StandardCharsets.UTF_8),
      state.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    if (!stateOk)
      throw new IllegalStateException("auth callback: mismatched state")
    error.foreach(e =>
      throw new IllegalStateException(s"auth callback: provider error '$e'"))
    val c = code.getOrElse(
      throw new IllegalStateException("auth callback: no code and no error"))
    val (access, refresh) = exchanger.exchange(c, redirectUri)
    store.put(accessName, access)
    store.put(refreshName, refresh)
    access
  }
}

/** The reference's lifecycle: stored-token fast path, refresh + store
  * on expiry. Stateless between calls — the secret store is the
  * source of truth, so concurrent pollers sharing one store converge
  * on the same rotated tokens. */
final class RefreshingTokenSource(
    store: SecretStore,
    endpoint: TokenEndpoint,
    accessName: String = "api-access-token",
    refreshName: String = "api-refresh-token") extends TokenSource {

  def accessToken(): String =
    store.get(accessName).filter(endpoint.isValid) match {
      case Some(valid) => valid
      case None =>
        val refreshTok = store.get(refreshName).getOrElse(throw new IllegalStateException(
          s"access token stale and no refresh token stored under '$refreshName'"))
        val (access, rotated) = endpoint.refresh(refreshTok)
        // store_tokens: persist the new access token; the reference
        // deliberately keeps its original refresh token (the save is
        // commented out there) — we persist a rotation only when the
        // provider actually returns one
        store.put(accessName, access)
        rotated.foreach(store.put(refreshName, _))
        access
    }
}
