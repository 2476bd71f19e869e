// Dev-time extraction of the bzip2 randomized-block RAND table (512
// ints) from the Hadoop jar on the Spark classpath, via reflection —
// the same extract-constants discipline as tools/extract_vp8_tables.py.
// Run: javac -cp /opt/spark/jars/hadoop-client-api-3.4.2.jar tools/extract_bz2_rand_table.java -d /tmp
//      java -cp /tmp:/opt/spark/jars/hadoop-client-api-3.4.2.jar extract_bz2_rand_table
import java.lang.reflect.Field;

public class extract_bz2_rand_table {
  public static void main(String[] args) throws Exception {
    Class<?> c = Class.forName("org.apache.hadoop.io.compress.bzip2.BZip2Constants");
    for (Field f : c.getDeclaredFields()) {
      if (f.getType() == int[].class) {
        f.setAccessible(true);
        int[] t = (int[]) f.get(null);
        System.out.println(f.getName() + " len=" + t.length);
        if (t.length == 512) {
          StringBuilder sb = new StringBuilder();
          for (int i = 0; i < 512; i++) {
            if (i % 16 == 0) sb.append("\n    ");
            sb.append(t[i]).append(", ");
          }
          System.out.println(sb);
        }
      }
    }
  }
}
