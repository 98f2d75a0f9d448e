package org.apache.avro.file

/** Package-access bridge into Avro's container-file internals — the
  * [[org.apache.spark.sql.graftbridge.ColumnBridge]] pattern applied
  * to Avro: `DataFileStream.Header.sync` (the per-file 16-byte sync
  * marker) has package-private access and no public getter, but
  * [[graft.sources.AvroSource]] needs it to verify a file's TRAILING
  * sync — Avro's own `hasNext` treats a truncated tail as clean EOF
  * (measured: a container cut mid-block reads as ZERO rows with no
  * exception), so without this check truncation is silent data loss,
  * not a quarantine event. Every well-formed container file ends with
  * its sync marker (the header emits it, and every block is followed
  * by it), so "last 16 bytes == sync" is the minimal integrity gate.
  */
object GraftAvroBridge {
  /** The 16-byte sync marker of an opened container stream's header. */
  def syncMarker(s: DataFileStream[_]): Array[Byte] = s.getHeader.sync
}
