from . import annotators, datasets, transforms, video_io
