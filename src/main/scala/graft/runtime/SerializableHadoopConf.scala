package graft.runtime

/** Hadoop `Configuration` is not `Serializable`, so task closures that
  * need filesystem access cannot close over the driver's configuration
  * directly. Rebuilding `new Configuration()` executor-side loses every
  * `spark.hadoop.*` overlay (object-store credentials, endpoints,
  * committers) — it only sees classpath XML — which works in local mode
  * and breaks on a real cluster. This wrapper serializes the driver's
  * configuration by value into the closure (the same approach as Spark's
  * own private `SerializableConfiguration`). */
class SerializableHadoopConf(
    @transient var value: org.apache.hadoop.conf.Configuration)
    extends Serializable {

  private def writeObject(out: java.io.ObjectOutputStream): Unit = {
    out.defaultWriteObject()
    value.write(out)
  }

  private def readObject(in: java.io.ObjectInputStream): Unit = {
    in.defaultReadObject()
    value = new org.apache.hadoop.conf.Configuration(false)
    value.readFields(in)
  }
}
