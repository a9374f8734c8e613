package graft.sinks

import org.apache.hadoop.conf.Configuration

/** Serializable wrapper shipping the driver's Hadoop configuration to
  * executor-side `FileSystem` lookups (Hadoop's `Configuration` is not
  * `java.io.Serializable`; this is the standard write/readFields bridge).
  * Needed so the distributed sink rename job resolves the SAME filesystem
  * (with the driver's fs.* settings and credentials) on every executor.
  */
final class SerializableHadoopConf(@transient var value: Configuration)
    extends Serializable {

  private def writeObject(out: java.io.ObjectOutputStream): Unit = {
    out.defaultWriteObject()
    value.write(out)
  }

  private def readObject(in: java.io.ObjectInputStream): Unit = {
    in.defaultReadObject()
    value = new Configuration(false)
    value.readFields(in)
  }
}
