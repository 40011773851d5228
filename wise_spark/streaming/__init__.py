from .incremental import stream_build_index, current_index_dir

__all__ = ["stream_build_index", "current_index_dir"]
