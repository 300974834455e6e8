from . import video_io
