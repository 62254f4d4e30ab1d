from .distance import nearest_code, nearest_code_xla
