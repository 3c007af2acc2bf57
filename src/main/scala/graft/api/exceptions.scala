package graft.api

/** Exception surface mirroring the reference
  * (`/root/reference/bytehub/exceptions.py`): a general store error, a
  * missing-entity error, and the remote/cloud variant raised by the REST
  * catalog client (exceptions.py / cloud.py:95-105). All extend the JDK
  * types previously thrown, so existing catch sites keep working.
  */
class FeatureStoreException(msg: String) extends IllegalArgumentException(msg)

class MissingFeatureException(msg: String) extends NoSuchElementException(msg)

/** A remote catalog call failed: transport error, auth failure, or a
  * non-2xx the server did not express as a domain error.
  */
class RemoteFeatureStoreException(msg: String) extends RuntimeException(msg)
