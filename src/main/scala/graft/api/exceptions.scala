package graft.api

/** Exception surface mirroring the reference
  * (`/root/reference/bytehub/exceptions.py`): a general store error and
  * a missing-entity error (the remote/cloud variant is out of scope,
  * SURVEY §2.1 S8). Both extend the JDK types previously thrown, so
  * existing catch sites keep working.
  */
class FeatureStoreException(msg: String) extends IllegalArgumentException(msg)

class MissingFeatureException(msg: String) extends NoSuchElementException(msg)
