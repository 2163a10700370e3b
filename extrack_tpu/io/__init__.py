from extrack_tpu.io.readers import read_table, read_trackmate_xml  # noqa: F401
from extrack_tpu.io import exporters  # noqa: F401
