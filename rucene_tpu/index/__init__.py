"""Index layer: writer, segments, reader, merge."""
